package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SubstrDedup

/** Round-21 optimization scratch probe: stage-by-stage noop timings for
  * the expensive bench queries, so a regression localizes to ONE stage
  * instead of a whole composed query. Dev tool, not library code.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.configure(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // warm scan

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"OPTPROBE $name%-36s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val which = if (args.isEmpty) Set("substr") else args.toSet

    if (which("jobs")) {
      // per-job wall time for one query execution: shows whether a
      // lifecycle query is compute-bound or job-count-bound
      val qname = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERY", "dedup_incr_kept")
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, (js.time,
            Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.get(je.jobId)
          if (st != null) done.add((je.jobId, (je.time - st._1) / 1e3, st._2))
        }
      }
      // warm once, then listen on the second run
      noop(graft.SparkEntry.queries(qname)(spark, sfDir))
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      noop(graft.SparkEntry.queries(qname)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      Thread.sleep(500)
      val ds = done.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"OPTPROBE jobs($qname): wall=$wall%.2f n_jobs=${ds.length} " +
        f"job_sum=${ds.map(_._2).sum}%.2f")
      ds.foreach { case (id, sec, desc) =>
        println(f"OPTPROBE   job $id%3d ${sec}%6.3f s  ${desc.take(80)}")
      }
    }

    if (which("substr")) {
      val k = 20
      time("substr: windows()") {
        noop(SubstrDedup.windows(docs, "text", "doc_id", k))
      }
      time("substr: windows+count>=2") {
        noop(SubstrDedup.windows(docs, "text", "doc_id", k)
          .groupBy("gram").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2).select("gram"))
      }
      time("substr: dupPositions(semi)") {
        val w = SubstrDedup.windows(docs, "text", "doc_id", k)
          .withColumnRenamed("gram", "gk")
        val dup = w.groupBy("gk").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2).select("gk")
        noop(w.join(dup, Seq("gk"), "left_semi").select(col("doc_id"), col("pos")))
      }
      time("substr: dupSpans") {
        noop(SubstrDedup.dupSpans(docs, "text", "doc_id", k, hashed = false))
      }
      time("substr: removeDupSpans") {
        noop(SubstrDedup.removeDupSpans(docs, "text", "doc_id", k, hashed = false))
      }
    }

    if (which("envelope")) {
      // r22 / VERDICT #8: kernel-vs-reference FORM timings at whatever
      // scale SPARK_GRAFT_SF_DIR points at (run at sf0.1 AND the ScaleGen
      // 100× corpus) — confirms the r21 native-kernel wins hold where
      // compute dominates, not just on the job-overhead-bound sf0.1 board
      import graft.ops.{Dedup, Pca}
      time("minhash sigs: kernel") {
        noop(Dedup.minhashSignatures(docs, "text", "doc_id"))
      }
      time("minhash sigs: ref (explode+groupBy)") {
        noop(Dedup.minhashSignaturesRef(docs, "text", "doc_id"))
      }
      time("shingle sets: kernel") {
        noop(Dedup.distinctShingleSets(docs, "text", "doc_id"))
      }
      time("shingle sets: ref (HOF chain)") {
        noop(Dedup.distinctShingleSetsRef(docs, "text", "doc_id"))
      }
      time("hashed shingle sets: kernel") {
        noop(docs.select(col("doc_id"),
          org.apache.spark.sql.graft.HashedDistinctShingles
            .hashedDistinctShingles(col("text")).as("shs")))
      }
      time("hashed shingle sets: ref (transform+xxhash64)") {
        noop(docs.select(col("doc_id"), array_distinct(transform(
          org.apache.spark.sql.graft.DistinctShingles
            .distinctShingles(col("text")), s => xxhash64(s))).as("shs")))
      }
      val emb = graft.Tables.load(spark, sfDir, "embeddings")
      val model = Pca.fit(emb, "embedding", 64, k = 4, scale = 1000)
      // VERDICT #4 re-evaluation: dropNearDuplicates' two band legs
      // re-derive the signature pipeline and verifyPairs re-derives the
      // shingle sets per join side. The candidate-bounded STAGED variant
      // checkpoints the pair set and the semi-pruned verification sets
      // (both bounded by the candidate set, never the corpus). A/B here
      // at sf0.1 AND 100× decides whether to restructure the operator.
      time("dropNearDups: current (re-derive)") {
        noop(Dedup.dropNearDuplicates(docs, "text", "doc_id", 0.8))
      }
      time("dropNearDups: staged candidate-bounded") {
        val p = Dedup.repCandidatePairs(docs, "text", "doc_id", 8, 2, 1000)
          .localCheckpoint(true)
        val ids = p.select(col("doc_a").as("doc_id"))
          .union(p.select(col("doc_b").as("doc_id"))).distinct()
        val need = Dedup.distinctShingleSets(
          docs.join(ids, Seq("doc_id"), "left_semi"), "text", "doc_id")
          .localCheckpoint(true)
        val uni = (col("n_a") + col("n_b") - col("inter")).cast("double")
        val dropped = p
          .join(need.select(col("doc_id").as("doc_a"), col("shs").as("sh_a"),
            col("nsh").as("n_a")), "doc_a")
          .join(need.select(col("doc_id").as("doc_b"), col("shs").as("sh_b"),
            col("nsh").as("n_b")), "doc_b")
          .select(col("doc_b").as("dropped_id"), col("n_a"), col("n_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"))
          .filter(when(uni > 0, col("inter").cast("double") / uni)
            .otherwise(lit(0.0)) >= 0.8)
          .select(col("dropped_id").as("doc_id")).distinct()
        noop(docs.join(dropped, Seq("doc_id"), "left_anti"))
        graft.ops.Lineage.release(p); graft.ops.Lineage.release(need)
      }
      time("pca project: kernel (no join)") {
        noop(Pca.project(emb, "vec_id", "embedding", model))
      }
      time("pca project: ref (broadcast crossJoin + zip_with)") {
        noop(Pca.projectRef(emb, "vec_id", "embedding", model))
      }
    }
    spark.stop()
  }
}
