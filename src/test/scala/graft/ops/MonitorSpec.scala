package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for the monitoring additions (rolling WAU, CUSUM,
  * bot regularity, Spearman, threshold sweep): every query's defining
  * property is recomputed by an independent in-memory model — the
  * oracle pins cross-engine equality; these pin the MEANING. In
  * particular the two algebraic rewrites (interval-coverage WAU
  * instead of a sliding distinct; prefix-min reflection instead of
  * the CUSUM recursion) are checked against their textbook forms.
  */
class MonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  private def snap(v: Double, s: Int): Double =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events: Array[(Long, Long, Long, Double)] =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  private lazy val docs: Array[(Long, String, String)] =
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private val Stop = Set("the", "a", "and", "of", "to", "in")
  /** Spark's split keeps trailing empty strings (limit -1). */
  private def words(text: String): Array[String] = text.split(" ", -1)

  // -------------------------------------------------------------
  test("rolling WAU: interval-coverage rewrite equals the sliding COUNT DISTINCT") {
    val userDays = events.map { case (u, _, sec, _) => (u, sec / 86400) }.toSet
    val days = userDays.map(_._2)
    val (mn, mx) = (days.min, days.max)
    val got = q("events_rolling_wau").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toVector == (mn to mx).toVector, "complete daily grid, in order")
    got.foreach { case (day, (dau, wau, stick)) =>
      val expDau = userDays.count(_._2 == day).toLong
      val expWau = userDays.groupBy(_._1).count { case (_, ds) =>
        ds.exists(ud => ud._2 >= day - 6 && ud._2 <= day)
      }.toLong
      assert(dau == expDau, s"day $day dau")
      assert(wau == expWau, s"day $day wau (sliding distinct)")
      val expStick = if (expWau == 0) 0.0 else snap(expDau.toDouble / expWau, 4)
      assert(math.abs(stick - expStick) < 1e-9, s"day $day stickiness")
    }
    assert(got.exists { case (_, (dau, wau, _)) => wau > dau },
      "fixture must exercise the window (some day has wau > dau)")
  }

  test("rolling WAU plan: no distinct and no expand downstream of the reduction") {
    val p = q("events_rolling_wau").queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "no count-distinct expansion: " + p.take(500))
    assert(p.contains("Generate explode"), "coverage intervals must explode: " + p.take(500))
  }

  // -------------------------------------------------------------
  test("CUSUM: prefix-min reflection equals the textbook recursion S=max(0,S+d)") {
    val byUser = events.groupBy(_._1)
    val got = q("events_cusum_drift").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.keySet == byUser.keySet)
    byUser.foreach { case (uid, es) =>
      val xs = es.sortBy(e => (e._3, e._2)).map(_._4)
      val n = xs.length
      val sx = xs.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      val sxx = xs.map(v => BigDecimal(v * v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      val mu = snap(sx.toDouble / n, 6)
      val vr = snap(math.max(sxx.toDouble / n - mu * mu, 0.0), 6)
      val sigma = snap(math.sqrt(vr), 6)
      val k = BigDecimal(snap(sigma * 0.5, 6)).setScale(6)
      val h = BigDecimal(snap(sigma * 4.0, 6)).setScale(6)
      val muD = BigDecimal(mu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      var s = BigDecimal(0)
      var maxS = BigDecimal(0)
      var nAlerts = 0L
      var firstAlert = -1L
      es.sortBy(e => (e._3, e._2)).foreach { case (_, _, sec, v) =>
        val d = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) - muD - k
        s = (s + d).max(BigDecimal(0))
        maxS = maxS.max(s)
        if (s > h) { nAlerts += 1; if (firstAlert < 0) firstAlert = sec }
      }
      val (gn, gmu, gsigma, gmax, galerts, gfirst) = got(uid)
      assert(gn == n.toLong, s"user $uid n_events")
      assert(math.abs(gmu - mu) < 1e-9 && math.abs(gsigma - sigma) < 1e-9, s"user $uid baseline")
      assert(math.abs(gmax - snap(maxS.toDouble, 4)) < 1e-9, s"user $uid max_stat")
      assert(galerts == nAlerts, s"user $uid n_alerts (recursion)")
      assert(gfirst == firstAlert, s"user $uid first_alert_sec")
    }
    assert(got.values.exists(_._5 > 0), "fixture must trigger some alerts")
    assert(got.values.exists(_._5 == 0), "fixture must leave some users un-alerted")
  }

  // -------------------------------------------------------------
  test("bot regularity: gap moments, modal share and flag match a direct model") {
    val byUser = events.groupBy(_._1)
    val got = q("events_bot_regularity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getInt(5)))
      .toMap
    byUser.foreach { case (uid, es) =>
      val secs = es.sortBy(e => (e._3, e._2)).map(_._3)
      val gaps = secs.sliding(2).map(p => p(1) - p(0)).toVector
      if (gaps.isEmpty) assert(!got.contains(uid))
      else {
        val n = gaps.length
        val mean2 = snap(gaps.sum.toDouble / n, 2)
        val mu6 = snap(gaps.sum.toDouble / n, 6)
        val sd6 = snap(math.sqrt(math.max(
          snap(gaps.map(g => g * g).sum.toDouble / n - mu6 * mu6, 6), 0.0)), 6)
        val cv = if (mu6 == 0.0) 0.0 else snap(sd6 / mu6, 4)
        val modal = gaps.groupBy(_ / 60).values.map(_.size).max
        val share = snap(modal.toDouble / n, 4)
        val flag = if (n >= 20 && (cv <= 0.3 || share >= 0.5)) 1 else 0
        val (gn, gmean, gcv, gshare, gflag) = got(uid)
        assert(gn == n.toLong && math.abs(gmean - mean2) < 1e-9, s"user $uid moments")
        assert(math.abs(gcv - cv) < 1e-9, s"user $uid cv")
        assert(math.abs(gshare - share) < 1e-9, s"user $uid modal share")
        assert(gflag == flag, s"user $uid flag")
      }
    }
  }

  // -------------------------------------------------------------
  test("spearman: tie-averaged rank correlation matches a direct model per lang") {
    def avgRanks(vs: Vector[Long]): Vector[Double] = {
      val sorted = vs.sorted.zipWithIndex
      val avg = sorted.groupBy(_._1).map { case (v, ps) =>
        v -> (ps.map(_._2 + 1).sum.toDouble / ps.size)
      }
      vs.map(avg)
    }
    def pearson(x: Vector[Double], y: Vector[Double]): Double = {
      val n = x.length
      val (mx, my) = (x.sum / n, y.sum / n)
      val num = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      num / den
    }
    val got = q("eval_spearman_doclen").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val byLang = docs.groupBy(_._3)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, ds) =>
      val xs = ds.toVector.sortBy(_._1).map(_._2.length.toLong)
      val ys = ds.toVector.sortBy(_._1).map(d => words(d._2).length.toLong)
      val rho = pearson(avgRanks(xs), avgRanks(ys))
      val r = pearson(xs.map(_.toDouble), ys.map(_.toDouble))
      val (gn, grho, gr) = got(lang)
      assert(gn == ds.length.toLong, s"$lang n_docs")
      assert(math.abs(grho - rho) < 1e-5, s"$lang spearman $grho vs $rho")
      assert(math.abs(gr - r) < 1e-5, s"$lang pearson $gr vs $r")
    }
    // ties exist in the fixture (word counts repeat), so the averaged-rank
    // path is genuinely exercised
    val wc = docs.map(d => words(d._2).length)
    assert(wc.distinct.length < wc.length, "fixture must contain rank ties")
  }

  test("spearman plan: rank windows stay partitioned by lang (no single-partition exchange)") {
    val p = q("eval_spearman_doclen").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      "per-lang ranks must not serialize through one partition: " + p.take(600))
  }

  // -------------------------------------------------------------
  test("threshold sweep: all 20 operating points match a direct confusion model") {
    val scored = docs.map { case (_, text, lang) =>
      val ws = words(text)
      val nStop = ws.count(Stop)
      val bucket = math.min(nStop * 20L / ws.length, 19L)
      (bucket, lang == "en")
    }
    val pTotal = scored.count(_._2).toLong
    val nTotal = scored.length - pTotal
    val got = q("eval_threshold_sweep").collect()
    assert(got.length == 20)
    got.foreach { r =>
      val thr = r.getLong(0)
      val tp = scored.count(s => s._1 >= thr && s._2).toLong
      val fp = scored.count(s => s._1 >= thr && !s._2).toLong
      assert(r.getLong(2) == tp && r.getLong(3) == fp, s"thr $thr tp/fp")
      assert(r.getLong(4) == pTotal - tp && r.getLong(5) == nTotal - fp, s"thr $thr fn/tn")
      val prec = if (tp + fp == 0) 0.0 else snap(tp.toDouble / (tp + fp), 4)
      val rec = if (pTotal == 0) 0.0 else snap(tp.toDouble / pTotal, 4)
      val f1 = if (prec + rec == 0.0) 0.0 else snap(2.0 * prec * rec / (prec + rec), 4)
      assert(math.abs(r.getDouble(6) - prec) < 1e-9, s"thr $thr precision")
      assert(math.abs(r.getDouble(7) - rec) < 1e-9, s"thr $thr recall")
      assert(math.abs(r.getDouble(8) - f1) < 1e-9, s"thr $thr f1")
    }
    // the sweep must be non-trivial: recall strictly drops somewhere and
    // precision exceeds the base rate somewhere
    val recs = got.map(_.getDouble(7)).toVector
    assert(recs.head == 1.0 && recs.exists(_ < 1.0), "recall must decay across thresholds")
  }

  test("changepoint localizes inside the alerting excursion, consistent with the alert query") {
    // columns: user_id, n_events, changepoint_sec, first_alert_sec, excursion_rows, stat_at_alert
    val cps = q("events_changepoint").collect()
    assert(cps.nonEmpty)
    val alerts = q("events_cusum_drift").collect()
      .map(r => r.getLong(0) -> (r.getLong(6), r.getLong(5))).toMap // first_alert_sec, n_alerts
    cps.foreach { r =>
      val (uid, cpSec, faSec, exRows) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cpSec <= faSec, s"user $uid: excursion start after its own alarm")
      assert(exRows >= 1, s"user $uid: alarm row itself is in the excursion")
      val (fa, nAlerts) = alerts(uid)
      assert(nAlerts > 0, s"user $uid localized but never alerted")
      assert(fa === faSec, s"user $uid: first-alarm instant must match the alert query")
    }
    // exactly the alerting users are localized
    assert(cps.map(_.getLong(0)).toSet ===
      alerts.filter(_._2._2 > 0).keySet)
  }
}
