package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._

/** Known-answer and metamorphic checks for the round-6 analytics tier.
  *
  * The DuckDB oracle proves the two ENGINES agree; these tests prove the
  * MATH is right — a misunderstanding shared by both sides of the oracle
  * (wrong AUC identity, off-by-one risk set, mis-signed residual) passes
  * the hash gate but cannot pass a constructed input whose answer is
  * known in closed form (Gini of equal spends = 0, AUC of a perfect
  * ranker = 1, a purely periodic series decomposes with zero residual
  * and forecasts itself exactly).
  */
class KnownAnswerSpec extends SparkSpec {

  private def writeEvents(dir: String,
                          rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    // raw events schema: ts is int64 NANOS (the fixture encoding
    // Tables.events expects); day d → d·86400e9
    val rws = rows.map { case (id, day, user, ty, v) =>
      Row(id, day * 86400L * 1000000000L, user, ty, v, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rws, 2), Tables.eventsRawSchema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ka-$tag").toString

  test("q194: equal spends have Gini exactly 0") {
    val dir = tmp("gini")
    // 4 users, one 10.00 event each of one type → identical cents
    writeEvents(dir, (1L to 4L).map(u => (u, 0L, u, "view", 10.0)))
    val got = graft.SparkEntry.queries("q194_gini_spend")(spark, dir)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("gini_bp") == 0L, got.toSeq)
  }

  test("q191: a perfectly separating activity count scores AUC = 10000; " +
    "a constant one scores 5000") {
    val dir = tmp("auc")
    // user u (1..8) has u 'view' events of 1.00 → spend = u·100, so the
    // upper half by spend is exactly users 5..8; give those one 'click'
    // of 0.00 (spend unchanged) → click count separates perfectly.
    // every user also gets one 'error' of 0.00 → constant feature.
    var id = 0L
    val rows = (1L to 8L).flatMap { u =>
      val views = (1L to u).map { _ => id += 1; (id, 0L, u, "view", 1.0) }
      val click = if (u >= 5) { id += 1; Seq((id, 0L, u, "click", 0.0)) }
                  else Seq.empty
      val err = { id += 1; Seq((id, 0L, u, "error", 0.0)) }
      views ++ click ++ err
    }
    writeEvents(dir, rows)
    val got = graft.SparkEntry.queries("q191_auc_roc")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("auc_bp")).toMap
    assert(got("click") == 10000L, got)
    assert(got("view") == 10000L, got)   // monotone in spend by design
    assert(got("error") == 5000L, got)   // all users tie → chance AUC
  }

  test("q192: simultaneous extinction emits NULL survival; a half-" +
    "converting cohort survives at exactly round(ln(1/2)*1e6)") {
    val d1 = tmp("km1")
    // all 3 users sign up and purchase on day 0 → d_t = n_risk at t=0
    writeEvents(d1, (1L to 3L).flatMap(u =>
      Seq((u * 2 - 1, 0L, u, "signup", 1.0), (u * 2, 0L, u, "purchase", 1.0))))
    val g1 = graft.SparkEntry.queries("q192_kaplan_meier")(spark, d1)
      .collect()
    assert(g1.length == 1 && g1.head.isNullAt(4), g1.toSeq)
    assert(g1.head.getAs[Long]("n_risk") == 3L &&
      g1.head.getAs[Long]("n_events") == 3L, g1.toSeq)

    val d2 = tmp("km2")
    // users 1,2 convert on day 1; users 3,4 never (horizon = day 3)
    writeEvents(d2,
      (1L to 4L).map(u => (u, 0L, u, "signup", 1.0)) ++
        Seq((11L, 1L, 1L, "purchase", 1.0), (12L, 1L, 2L, "purchase", 1.0),
          (13L, 3L, 3L, "view", 1.0), (14L, 3L, 4L, "view", 1.0)))
    val g2 = graft.SparkEntry.queries("q192_kaplan_meier")(spark, d2)
      .collect().map(r => r.getAs[Long]("t_days") -> r).toMap
    // t=1: n_risk 4, d 2 → surv = round(ln(2/4)·1e6) = −693147
    assert(g2(1L).getAs[Long]("surv_unat") == -693147L, g2(1L))
    // t=3: censored only — survival carries, no extinction
    assert(g2(3L).getAs[Long]("n_censored") == 2L &&
      g2(3L).getAs[Long]("surv_unat") == -693147L, g2(3L))
  }

  test("q195: a single-type user has entropy 0; a uniform 5-type user " +
    "has exactly ln(5) milli-nats") {
    val dir = tmp("ent")
    val types = Seq("view", "click", "purchase", "signup", "error")
    var id = 0L
    val rows =
      (1L to 20L).map { _ => id += 1; (id, 0L, 1L, "view", 1.0) } ++
        types.flatMap(t => (1 to 100).map { _ =>
          id += 1; (id, 0L, 2L, t, 1.0) })
    writeEvents(dir, rows)
    val got = graft.SparkEntry.queries("q195_user_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("entropy_mnat")).toMap
    assert(got(1L) == 0L, got)
    assert(got(2L) == 1609L, got) // ln 5 = 1.6094 nat
  }

  test("q201/q205: a purely weekday-periodic series decomposes with " +
    "zero residual and forecasts itself exactly") {
    val dir = tmp("per")
    // one event per day, cents = (day%7+1)·100 — period-7, no noise
    writeEvents(dir, (0L to 20L).map(d =>
      (d + 1, d, 1L, "view", (d % 7 + 1).toDouble)))
    val dec = graft.SparkEntry.queries("q201_seasonal_decompose")(spark, dir)
      .collect()
    assert(dec.length == 21)
    dec.foreach { r =>
      if (!r.isNullAt(3)) { // trend defined ⇒ exact decomposition
        assert(r.getAs[Long]("trend") == 400L, r)
        assert(r.getAs[Long]("resid") == 0L, r)
      } else assert(r.isNullAt(5), r) // edges: resid NULL too
    }
    val bt = graft.SparkEntry.queries("q205_forecast_backtest")(spark, dir)
      .collect()
    assert(bt.length == 1 && bt.head.getAs[Long]("mae_cents") == 0L &&
      bt.head.getAs[Long]("wape_bp") == 0L && bt.head.getAs[Long]("n_days") == 14L,
      bt.toSeq)
  }

  test("q206: an error-free log burns zero budget") {
    val dir = tmp("slo")
    writeEvents(dir, (0L to 9L).map(d => (d + 1, d, 1L, "view", 1.0)))
    val got = graft.SparkEntry.queries("q206_slo_burn")(spark, dir).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getAs[Long]("burn_milli") == 0L &&
        r.getAs[Long]("cum_err_bp") == 0L, r)
    }
  }

  test("q198: reference-population rows map to themselves at every rank " +
    "(identity of quantile normalization) — real fixture") {
    val bad = graft.SparkEntry.queries("q198_quantile_normalize")(spark, sfDir)
      .filter(col("event_type") === "view" &&
        col("norm_cents") =!= col("cents"))
      .count()
    assert(bad == 0L)
  }

  test("q198's lag+sequence bp→cents lookup == the grid theta-join form " +
    "on a collision-heavy distribution (cum_bp repeats)") {
    // 5000 reference rows over 400 distinct cents values → every cents
    // step advances cum_bp by ~25/12500ths, so consecutive rows SHARE a
    // cum_bp value constantly — the integer-div collision edge the
    // round-13 rewrite's range guard must drop exactly like min() did
    import org.apache.spark.sql.expressions.Window
    val vc = spark.range(0L, 400L)
      .select((col("id") * 7L % 400L).as("cents"),
        (col("id") % 3L + 1L).as("c"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vcum = vc
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy()))
      .select(col("cents"), expr("cum * 10000 div tot").as("cum_bp"))
    val grid = spark.range(0L, 10001L).select(col("id").as("bp"))
    val thetaForm = grid.join(vcum, col("cum_bp") >= col("bp"))
      .groupBy(col("bp")).agg(min(col("cents")).as("norm_cents"))
    val wLag = Window.orderBy(col("cents"))
    val lagForm = vcum
      .withColumn("prev", lag(col("cum_bp"), 1, -1L).over(wLag))
      .filter(col("cum_bp") > col("prev"))
      .select(explode(sequence(col("prev") + 1L, col("cum_bp"))).as("bp"),
        col("cents").as("norm_cents"))
    assert(lagForm.count() == 10001L)
    assert(thetaForm.exceptAll(lagForm).count() == 0L)
    assert(lagForm.exceptAll(thetaForm).count() == 0L)
  }

  test("q193: a verbatim-contained document scores containment 10000 " +
    "from its side") {
    val dir = tmp("cont")
    val words = (1 to 30).map(i => s"w$i")
    val full = words.mkString(" ")                 // doc 0: 30 tokens
    val sub = words.take(20).mkString(" ")         // doc 1 ⊂ doc 0
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, full, "en", "a"), (1L, sub, "en", "a"),
      (2L, other, "en", "b"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, t, l, s) =>
        Row(i, t, l, s, t.length.toLong) }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType))))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q193_span_containment")(spark, dir)
      .collect()
    assert(got.length == 1, got.toSeq)
    val r = got.head
    assert(r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L, r)
    // doc1 has 20−8+1 = 13 distinct windows, all inside doc0
    assert(r.getAs[Long]("n_shared") == 13L &&
      r.getAs[Long]("cont_ba_bp") == 10000L, r)
    // doc0 has 23 windows → 13·10⁴ div 23 = 5652 from its side
    assert(r.getAs[Long]("cont_ab_bp") == 5652L, r)
  }
}
