package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 gates: the float-portability sweep the r12 verdict mandated.
  *
  *  1. The failure class that made `series_linreg`/`stream_linreg`
  *     driver-red: `round(CAST(wide AS DOUBLE) / …, 6)` where `wide` is a
  *     HUGEINT/decimal(38) value past 2^53 — the narrowing conversion and
  *     the round() are ENGINE-IMPLEMENTED there, so one ULP of difference
  *     between DuckDB builds flips the compare hash. The scan walks every
  *     registered oracle (the SQL mirrors the Spark algebra by contract)
  *     and bans wide-int SQL from co-occurring with a double cast unless
  *     the key is in an audited allowlist (empty today: every wide-int
  *     oracle — anomaly's z² comparison, linreg's micro-units, Pearson's
  *     pack — stays integer end-to-end).
  *  2. linreg's quotient/remainder micro-split must truncate toward zero
  *     on NEGATIVE slopes with both terms sharing a sign (the property
  *     that makes the two-term sum equal the true truncated quotient in
  *     both engines).
  *  3. `transitionsMachine` must reject an event whose key EQUALS the
  *     high-water mark (duplicate redelivery) — accepting it would emit an
  *     extra pair and diverge from batch lag semantics (packMachine's
  *     stricter guard, now shared).
  */
class Round13Spec extends AnyFunSuite with TestSpark {

  // -------------------------------------------- wide-int → double oracle ban

  /** Keys audited as safe despite combining wide-int SQL with a double
    * cast. Empty: no registered oracle may narrow a HUGEINT/decimal(38)
    * value to double — emit integer fixed-point (micro-units, the
    * knn_pagerank ppm pattern) instead.
    */
  private val WideDoubleAllowlist: Set[String] = Set.empty

  test("no oracle narrows HUGEINT/decimal(38) to double") {
    val offenders = Registry.ops.flatMap { op =>
      op.oracle.flatMap { sql =>
        val u = sql.toUpperCase
        val wide = u.contains("HUGEINT") || u.contains("DECIMAL(38")
        val dbl = u.contains("AS DOUBLE")
        if (wide && dbl && !WideDoubleAllowlist(op.name)) Some(op.name)
        else None
      }
    }
    assert(offenders.isEmpty,
      s"oracles mixing wide-int SQL with a double cast: $offenders — a " +
        "HUGEINT/decimal(38)→double narrowing is engine-implemented past " +
        "2^53 and can flip the compare hash across DuckDB builds; emit " +
        "exact integer micro-units (the linreg quotient/remainder split) " +
        "or audit the bound in WideDoubleAllowlist")
  }

  // ------------------------------------------------- linreg truncation law

  test("linreg micro-split truncates toward zero on negative slopes") {
    import spark.implicits._
    import graft.operators.Series
    // points (t=0, 100 cents), (t=3, 0 cents): slope = -1/3 value/s →
    // micro = trunc(-333333.33…) = -333333 (toward zero, NOT floor
    // -333334); fit at x_last=3 is exactly 0. Pins that q = fn DIV fd and
    // r = fn MOD fd share the dividend's sign so the two-term sum equals
    // the true truncated quotient.
    val cents = Seq(("a", 0L, 1L, 100L), ("a", 3L, 2L, 0L))
      .toDF("path", "ts", "event_id", "cents")
    val r = Series.linregFrom(Series.linregMomentsFrom(cents)).collect()(0)
    assert(r.getLong(2) == -333333L,
      s"slope_micro = ${r.getLong(2)} — expected trunc-toward-zero -333333")
    assert(r.getLong(3) == 0L)
  }

  // ------------------------------------- duplicate-redelivery guard (equal k)

  test("stream_transitions rejects an equal-key duplicate redelivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionStream
    implicit val sq = spark.sqlContext
    implicit val te = org.apache.spark.sql.Encoders.product[SessionStream.TransEvent]
    val ms = MemoryStream[SessionStream.TransEvent]
    val q = SessionStream.transitionsMachine(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("r13_dup_trans")
      .outputMode("append").start()
    try {
      ms.addData(SessionStream.TransEvent(1L, "view", 100L))
      q.processAllAvailable()
      // SAME key as the high-water mark: a redelivered duplicate — must
      // fail the contract, not emit a second (view -> view) pair
      ms.addData(SessionStream.TransEvent(1L, "view", 100L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(e: Throwable): Seq[String] =
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).toSeq
      assert(chain(ex).exists(m => m != null && m.contains("out-of-order")),
        s"expected the out-of-order guard on an equal key, got: ${chain(ex)}")
    } finally {
      q.stop(); spark.catalog.dropTempView("r13_dup_trans")
    }
  }
}
