package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.when

/** Shared bit/number reinterpretation helpers. */
object Bits {

  /** Reinterpret an unsigned [0, 2^32) value as a signed int32 (two's
    * complement) — the wire convention of big-endian int fields (registry
    * schema ids, BMP dimensions).
    */
  def signed32(c: Column): Column =
    when(c >= 2147483648L, c - 4294967296L).otherwise(c)
}
