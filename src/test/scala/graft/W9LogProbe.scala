package graft

/** The measurement that CLOSED the w9_logcum sweep residual (round
  * 11): on the REAL sf0.1 log inputs, Java `Math.log` (the HotSpot
  * intrinsic) disagrees with DuckDB's (glibc) `ln` on 55 of 98,055
  * distinct inputs, while `StrictMath.log` (fdlibm) disagrees on
  * 7,033. Spark's BUILT-IN `log` expression calls StrictMath (checked
  * in the 4.1.2 bytecode), so w9 was unknowingly emitting the
  * 128×-worse variant — switching the pipeline to
  * [[graft.functions.IntrinsicLog]] (Math.log) made w9_logcum
  * hash-EXACT at sf0.1, the last sweep exception.
  *
  * Input TSV (hex little-endian double bits: ratio, duckdb ln) is
  * produced by:
  * {{{
  * python3 - <<'EOF'
  * import duckdb, struct
  * con = duckdb.connect()
  * con.sql("CREATE VIEW events AS SELECT * FROM '<sfDir>/events.parquet'")
  * rows = con.sql("""
  * WITH o AS (SELECT user_id, value,
  *     lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  *   FROM events)
  * SELECT DISTINCT value/prev AS r, ln(value/prev) AS l
  * FROM o WHERE prev IS NOT NULL AND value/prev > 0""").fetchall()
  * with open('/tmp/w9_ratios.tsv', 'w') as f:
  *     for r, l in rows:
  *         f.write(struct.pack('<d', r).hex() + "\t" +
  *                 struct.pack('<d', l).hex() + "\n")
  * EOF
  * }}}
  * Usage: Test/runMain graft.W9LogProbe [/tmp/w9_ratios.tsv]
  */
object W9LogProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/w9_ratios.tsv")
    def fromHex(h: String): Double =
      java.lang.Double.longBitsToDouble(
        java.lang.Long.reverseBytes(java.lang.Long.parseUnsignedLong(h, 16)))
    var n = 0; var mMath = 0; var mStrict = 0
    scala.io.Source.fromFile(path).getLines().foreach { ln =>
      val Array(rh, lh) = ln.split("\t")
      val r = fromHex(rh); val l = fromHex(lh)
      n += 1
      if (java.lang.Double.doubleToRawLongBits(math.log(r)) !=
          java.lang.Double.doubleToRawLongBits(l)) mMath += 1
      if (java.lang.Double.doubleToRawLongBits(StrictMath.log(r)) !=
          java.lang.Double.doubleToRawLongBits(l)) mStrict += 1
    }
    println(s"W9PROBE n=$n mathLog_mismatch=$mMath strictLog_mismatch=$mStrict")
  }
}
