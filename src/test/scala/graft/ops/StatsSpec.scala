package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantic pins for the statistical-testing additions (mutual
  * information / chi-square, per-source KS, decision stump, robust
  * means): every statistic is recomputed by an independent in-memory
  * model — the oracle pins cross-engine equality; these pin the
  * MEANING (and, for KS, that the integer cross-multiplied supremum
  * really is the sup of the CDF difference).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  private def snap(v: Double, s: Int): Double =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Ln2 = 0.6931471805599453
  private val Stop = Set("the", "a", "and", "of", "to", "in")
  private def words(text: String): Array[String] = text.split(" ", -1)

  private lazy val docs: Array[(String, String, String)] =
    Tables.table(spark, dir, "documents")
      .select(col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  private lazy val events: Array[(String, Double)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))

  /** The text_quality composite score at its 3-dp grain. */
  private def quality(text: String): Double = {
    val ws = words(text)
    val nw = ws.length
    val nStop = ws.count(Stop)
    snap(0.5 * math.min(nw / 100.0, 1.0) + 0.5 * (1.0 - snap(nStop.toDouble / nw, 3)), 3)
  }

  // -------------------------------------------------------------
  test("MI/chi-square: contingency statistics match a direct model") {
    val joint = docs.groupBy(d => (d._3, d._2)).view.mapValues(_.length.toLong).toMap
    val nS = joint.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nL = joint.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = docs.length.toLong
    def miTerm(sl: ((String, String), Long)): BigDecimal = {
      val ((s, l), c) = sl
      val p = c.toDouble / n
      val lnr = snap(math.log((c * n).toDouble / (nS(s) * nL(l)).toDouble), 6)
      BigDecimal(p * lnr).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    def chiTerm(sl: ((String, String), Long)): BigDecimal = {
      val ((s, l), c) = sl
      val e = (nS(s) * nL(l)).toDouble / n
      BigDecimal(math.pow(c - e, 2.0) / e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val miBits = snap(joint.map(miTerm).sum.toDouble / Ln2, 6)
    val chi2 = snap(joint.map(chiTerm).sum.toDouble, 4)
    val v = snap(math.sqrt(chi2 / (n * math.min(nS.size - 1, nL.size - 1))), 6)
    val got = q("eval_mi_association").collect()
    assert(got.map(_.getString(0)).toSet == nS.keySet)
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == nS(s), s"$s n_docs")
      val miPart = snap(joint.filter(_._1._1 == s).map(miTerm).sum.toDouble / Ln2, 6)
      val chiPart = snap(joint.filter(_._1._1 == s).map(chiTerm).sum.toDouble, 4)
      assert(math.abs(r.getDouble(2) - miPart) < 1e-9, s"$s mi_part")
      assert(math.abs(r.getDouble(3) - chiPart) < 1e-9, s"$s chi2_part")
      assert(math.abs(r.getDouble(4) - miBits) < 1e-9, "global mi")
      assert(math.abs(r.getDouble(5) - chi2) < 1e-9, "global chi2")
      assert(math.abs(r.getDouble(6) - v) < 1e-9, "cramers v")
    }
    assert(miBits > 0.0 && v > 0.0 && v <= 1.0, "fixture association is non-degenerate")
  }

  // -------------------------------------------------------------
  test("KS per source: integer-argmax supremum equals the direct CDF sup") {
    val scored = docs.map(d => (d._3, quality(d._1)))
    val gridV = scored.map(_._2).distinct.sorted
    val n = scored.length.toLong
    val got = q("eval_ks_by_source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    scored.groupBy(_._1).foreach { case (src, inRows) =>
      val nIn = inRows.length.toLong
      val nRest = n - nIn
      val inVals = inRows.map(_._2)
      val restVals = scored.filter(_._1 != src).map(_._2)
      val d = gridV.map { v =>
        val fIn = inVals.count(_ <= v).toDouble / nIn
        val fRest = restVals.count(_ <= v).toDouble / nRest
        math.abs(fIn - fRest)
      }.max
      val (gn, gr, gks, gsc) = got(src)
      assert(gn == nIn && gr == nRest, s"$src sizes")
      assert(math.abs(gks - snap(d, 6)) < 1e-6, s"$src ks $gks vs $d")
      val scaled = snap(snap(d, 6) * math.sqrt(nIn.toDouble * nRest / (nIn + nRest)), 4)
      assert(math.abs(gsc - scaled) < 1e-9, s"$src scaled")
    }
  }

  // -------------------------------------------------------------
  test("Wasserstein per source: grid integral equals the direct CDF-area model") {
    val scored = docs.map(d => (d._3, quality(d._1)))
    val gridV = scored.map(_._2).distinct.sorted
    val n = scored.length.toLong
    val got = q("eval_wasserstein_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == scored.map(_._1).toSet)
    scored.groupBy(_._1).foreach { case (src, inRows) =>
      val nIn = inRows.length.toLong
      val nRest = n - nIn
      val inVals = inRows.map(_._2)
      val restVals = scored.filter(_._1 != src).map(_._2)
      // direct model: integrate |F_in - F_rest| over the step grid in
      // exact BigDecimal (counts are integers, gaps are 3-dp decimals)
      val area = gridV.indices.map { i =>
        val v = gridV(i)
        val gap =
          if (i + 1 < gridV.length)
            BigDecimal(gridV(i + 1)).setScale(3, BigDecimal.RoundingMode.HALF_UP) -
              BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
          else BigDecimal(0)
        val num = BigDecimal(
          math.abs(inVals.count(_ <= v).toLong * nRest - restVals.count(_ <= v).toLong * nIn))
        num * gap
      }.sum
      val w1 = snap((area / BigDecimal(nIn * nRest)).toDouble, 6)
      val (gn, gr, gw) = got(src)
      assert(gn == nIn && gr == nRest, s"$src sizes")
      assert(math.abs(gw - w1) < 1e-6, s"$src w1 $gw vs $w1")
      assert(gw >= 0.0 && gw <= 1.0, s"$src w1 in the score range")
    }
    // non-degenerate fixture: at least one source visibly drifts
    assert(got.values.exists(_._3 > 0.0), "some drift exists")
  }

  // -------------------------------------------------------------
  test("conformal: k-th order statistic on val, coverage on test match a direct model") {
    val withId: Array[(Long, String, String)] =
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val scored = withId.map { case (id, text, lang) => (lang, bucket(id), quality(text)) }
    val cal = scored.filter(d => d._2 >= 90 && d._2 < 95)
    val tst = scored.filter(_._2 >= 95)
    val got = q("eval_conformal_threshold").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == cal.map(_._1).toSet)
    cal.groupBy(_._1).foreach { case (lang, rows) =>
      val n = rows.length
      val k = math.ceil(0.8 * (n + 1)).toLong
      val r = got(lang)
      assert(r.getLong(1) == n, s"$lang n_cal")
      assert(r.getLong(3) == k, s"$lang k: ${r.getLong(3)} vs direct ceil $k")
      val nTest = tst.count(_._1 == lang).toLong
      assert(r.getLong(2) == nTest, s"$lang n_test")
      if (k <= n) {
        val qhat = rows.map(_._3).sorted.apply((k - 1).toInt)
        assert(math.abs(r.getDouble(4) - qhat) < 1e-12, s"$lang qhat")
        if (nTest > 0) {
          val cov = tst.count(d => d._1 == lang && d._3 <= qhat).toDouble / nTest
          assert(math.abs(r.getDouble(5) - snap(cov, 6)) < 1e-9, s"$lang coverage")
        } else assert(r.isNullAt(5), s"$lang empty-test coverage")
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5), s"$lang under-calibrated NULLs")
      }
    }
  }

  // -------------------------------------------------------------
  test("CUPED: sufficient-statistic readout matches a direct per-user model") {
    val evRows = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (evRows.map(_._2).min + evRows.map(_._2).max) / 2
    def md5arm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    def d4(v: Double): BigDecimal = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val perUser = evRows.groupBy(_._1).map { case (uid, es) =>
      val x = es.filter(_._2 < mid).map(e => d4(e._3)).sum
      val y = es.filter(_._2 >= mid).map(e => d4(e._3)).sum
      (md5arm(uid), x, y)
    }.toSeq
    def stats(a: Long) = {
      val rows = perUser.filter(_._1 == a)
      (rows.length.toLong, rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble,
        rows.map(r => r._2 * r._2).sum.toDouble, rows.map(r => r._3 * r._3).sum.toDouble,
        rows.map(r => r._2 * r._3).sum.toDouble)
    }
    val (na, sxa, sya, sxxa, syya, sxya) = stats(0)
    val (nb, sxb, syb, sxxb, syyb, sxyb) = stats(1)
    val nn = (na + nb).toDouble
    val (sxp, syp) = (sxa + sxb, sya + syb)
    val covp = ((sxya + sxyb) - sxp * syp / nn) / nn
    val varxp = ((sxxa + sxxb) - sxp * sxp / nn) / nn
    val varyp = ((syya + syyb) - syp * syp / nn) / nn
    val theta = snap(covp / varxp, 6)
    val (mya, myb) = (sya / na, syb / nb)
    val vya = syya / na - mya * mya
    val vyb = syyb / nb - myb * myb
    val cva = sxya / na - (sxa / na) * mya
    val cvb = sxyb / nb - (sxb / nb) * myb
    val vxa = sxxa / na - (sxa / na) * (sxa / na)
    val vxb = sxxb / nb - (sxb / nb) * (sxb / nb)
    val vca = vya - 2.0 * theta * cva + theta * theta * vxa
    val vcb = vyb - 2.0 * theta * cvb + theta * theta * vxb
    val diffRaw = myb - mya
    val diffCuped = diffRaw - theta * (sxb / nb - sxa / na)
    val r = q("events_ab_cuped").collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb, "arm sizes")
    assert(math.abs(r.getDouble(2) - snap(mya, 6)) < 1e-6, "mean_y_a")
    assert(math.abs(r.getDouble(3) - snap(myb, 6)) < 1e-6, "mean_y_b")
    assert(math.abs(r.getDouble(4) - snap(diffRaw, 6)) < 1e-6, "diff_raw")
    assert(math.abs(r.getDouble(5) - theta) < 1e-6, "theta")
    assert(math.abs(r.getDouble(6) - snap(covp * covp / (varxp * varyp), 6)) < 1e-6, "rho2")
    assert(math.abs(r.getDouble(7) - snap(diffRaw / math.sqrt(vya / na + vyb / nb), 4)) < 1e-3, "z_raw")
    assert(math.abs(r.getDouble(8) - snap(diffCuped / math.sqrt(vca / na + vcb / nb), 4)) < 1e-3, "z_cuped")
    // pooled CUPED variance never exceeds the raw pooled variance
    // (per-arm variance CAN tick up when the arm's covariance opposes
    // the pooled theta — only the pooled reduction is guaranteed)
    val vcp = varyp - 2.0 * theta * covp + theta * theta * varxp
    assert(vcp <= varyp + 1e-9, "pooled variance reduction one-sided")
  }

  // -------------------------------------------------------------
  test("KMV: sketch estimates match a direct k-minimum-values model; exact below capacity") {
    val k = 64
    val two60 = 1152921504606846976L
    def h(elem: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(elem.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("ts").cast("long").as("sec"))
      .collect()
      .map(r => (r.getString(0), s"${r.getLong(1)}:${r.getLong(2) / 86400}"))
      .distinct
    val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def sketch(s: Set[String]): Vector[Long] = s.map(h).toVector.sorted.take(k)
    def est(sk: Vector[Long]): Double =
      if (sk.length < k) sk.length.toDouble else (k - 1).toDouble / (sk.last.toDouble / two60)
    val got = q("agg_kmv_distinct").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val types = byType.keys.toSeq.sorted
    val pairs = for (i <- types.indices; j <- i + 1 until types.length) yield (types(i), types(j))
    assert(got.keySet == pairs.toSet, "complete pair grid")
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (byType(a), byType(b))
      val (ska, skb) = (sketch(sa), sketch(sb))
      val mk = (ska ++ skb).distinct.sorted.take(k)
      val uEst = est(mk)
      val both = mk.count(x => ska.contains(x) && skb.contains(x))
      val rho = both.toDouble / mk.length
      val r = got((a, b))
      assert(r.getLong(2) == sa.size && r.getLong(4) == sb.size, s"$a-$b exact sizes")
      assert(math.abs(r.getDouble(3) - snap(est(ska), 2)) < 1e-6, s"$a n_est")
      assert(r.getLong(6) == (sa union sb).size, s"$a-$b union_exact")
      assert(math.abs(r.getDouble(7) - snap(uEst, 2)) < 1e-6, s"$a-$b union_est")
      assert(r.getLong(8) == (sa intersect sb).size, s"$a-$b inter_exact")
      assert(math.abs(r.getDouble(9) - snap(rho * uEst, 2)) < 1e-6, s"$a-$b inter_est")
      assert(math.abs(r.getDouble(11) - snap(rho, 4)) < 1e-6, s"$a-$b jaccard_est")
      // the audit property: below capacity the sketch IS the set
      if ((sa union sb).size < k) {
        assert(r.getDouble(7) == (sa union sb).size.toDouble, s"$a-$b exact-below-capacity")
        assert(r.getDouble(9) == (sa intersect sb).size.toDouble, s"$a-$b inter exact")
      }
    }
  }

  // -------------------------------------------------------------
  test("Benford audit: digit distribution, chi-square and MAD match a direct model") {
    val prices = Tables.table(spark, dir, "orders")
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val digitOf = prices.map { p =>
      val cents = BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
      cents.toBigInt.toString.charAt(0).asDigit
    }
    val counts = (1 to 9).map(d => d -> digitOf.count(_ == d).toLong).toMap
    val n = prices.length.toLong
    val expected = (1 to 9).map(d => d -> snap(math.log10(1.0 + 1.0 / d), 6)).toMap
    def d6(v: Double) = BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val chi2 = snap((1 to 9).map { d =>
      val e = expected(d) * n
      d6(math.pow(counts(d) - e, 2.0) / e)
    }.sum.toDouble, 4)
    val mad = snap((1 to 9).map { d =>
      d6(math.abs(snap(counts(d).toDouble / n, 6) - expected(d)))
    }.sum.toDouble / 9.0, 6)
    val got = q("audit_benford").collect()
    assert(got.length == 9)
    assert(got.map(_.getLong(1)).sum == n, "digits partition the table")
    got.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == counts(d), s"digit $d count")
      assert(math.abs(r.getDouble(3) - expected(d)) < 1e-9, s"digit $d expected")
      assert(math.abs(r.getDouble(4) - chi2) < 1e-6, "chi2")
      assert(math.abs(r.getDouble(5) - mad) < 1e-9, "mad")
    }
  }

  // -------------------------------------------------------------
  test("profile audit: per-column nulls/distincts/ranges match a direct model") {
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("ts").cast("long").as("sec"))
      .collect()
    val got = q("audit_profile_events").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("event_id", "user_id", "event_type", "value", "props", "sec"))
    got.values.foreach(r => assert(r.getLong(1) == rows.length.toLong, "n"))
    def check(name: String, vals: Seq[Any]): Unit = {
      val r = got(name)
      assert(r.getLong(2) == vals.filter(_ != null).distinct.size.toLong, s"$name distinct")
      assert(r.getLong(3) == vals.count(_ == null).toLong, s"$name nulls")
    }
    check("event_id", rows.map(_.get(0)).toSeq)
    check("user_id", rows.map(_.get(1)).toSeq)
    check("event_type", rows.map(_.get(2)).toSeq)
    check("value", rows.map(_.get(3)).toSeq)
    check("props", rows.map(_.get(4)).toSeq)
    check("sec", rows.map(_.get(5)).toSeq)
    assert(got("event_id").getDouble(4) == rows.map(_.getLong(0)).min.toDouble, "id min")
    assert(got("sec").getDouble(5) == rows.map(_.getLong(5)).max.toDouble, "sec max")
    assert(got("event_type").isNullAt(4) && got("props").isNullAt(5), "non-numeric ranges NULL")
  }

  // -------------------------------------------------------------
  test("Poisson bootstrap: derandomized weights and the integer variance match a direct model") {
    // P-scale Poisson(1) cutoffs + the hash-once-per-doc replicate mix
    // (one md5 per doc; replicate b draws its own (a·x + b) mod P hash)
    val cuts = Seq(790015084L, 1580030168L, 1975037710L, 2106706891L,
      2139624186L, 2146207645L, 2147304888L, 2147461637L, 2147481231L)
    val P = 2147483647L
    def md5u32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(id: Long, rep: Int): Int = {
      val hp = md5u32(id.toString) % P
      val u = (hp * ((1099087573L * (rep + 1)) % P) + rep) % P
      cuts.count(c => u >= c)
    }
    val docsWithId = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docsWithId.map { case (id, text) => (id, quality(text)) }
    val b = 32
    val mq = (0 until b).map { rep =>
      var swv = BigDecimal(0); var sw = 0L
      scored.foreach { case (id, v) =>
        val w = weight(id, rep)
        swv += BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) * w
        sw += w
      }
      (BigDecimal(snap(swv.toDouble / sw, 6)) * 1000000).toLongExact
    }
    val sm = mq.sum; val smm = mq.map(m => m * m).sum
    val ssScaled = b * smm - sm * sm
    val se = snap(math.sqrt(ssScaled.toDouble / (b.toLong * (b - 1))) / 1e6, 6)
    val meanFull = snap(scored.map(s =>
      BigDecimal(s._2).setScale(3, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / scored.length, 6)
    val r = q("eval_bootstrap_ci").collect().head
    assert(r.getLong(0) == scored.length.toLong, "n")
    assert(r.getInt(1) == b, "b_replicates")
    assert(math.abs(r.getDouble(2) - meanFull) < 1e-9, "mean_full")
    assert(math.abs(r.getDouble(3) - se) < 1e-9, s"se_boot ${r.getDouble(3)} vs $se")
    assert(math.abs(r.getDouble(4) - snap(meanFull - 1.96 * se, 6)) < 1e-9, "ci_lo")
    assert(math.abs(r.getDouble(5) - snap(meanFull + 1.96 * se, 6)) < 1e-9, "ci_hi")
    // the bootstrap sanity: the CI contains the point estimate, se > 0
    assert(se > 0 && r.getDouble(4) < meanFull && meanFull < r.getDouble(5))
    // weights behave like Poisson(1): total resample mass within 25% of n per replicate
    val masses = (0 until b).map(rep => scored.map(s => weight(s._1, rep)).sum)
    masses.foreach(m => assert(math.abs(m - scored.length) < scored.length * 0.25, s"mass $m"))
  }

  // -------------------------------------------------------------
  test("rank fusion: level-table competition ranks equal direct ranks; RRF top-20 ordering holds") {
    val rows = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = rows.map { case (id, text) =>
      (id, quality(text), words(text).length.toLong)
    }
    def rankOf[T](vals: Seq[T], v: T)(implicit o: Ordering[T]): Long =
      vals.count(x => o.gt(x, v)).toLong + 1
    val qs = scored.map(_._2).toSeq
    val ls = scored.map(_._3).toSeq
    val fused = scored.map { case (id, v, nw) =>
      val rq = rankOf(qs, v)
      val rl = rankOf(ls, nw)
      (id, rq, rl, snap(1.0 / (60 + rq) + 1.0 / (60 + rl), 8))
    }
    val expected = fused.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = q("eval_rank_fusion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1, s"order: ${g._1} vs ${e._1}")
      assert(g._2 == e._2 && g._3 == e._3, s"doc ${g._1} ranks")
      assert(math.abs(g._4 - e._4) < 1e-12, s"doc ${g._1} rrf")
    }
  }

  // -------------------------------------------------------------
  test("decision stump: information gain per threshold and the best flag match a direct model") {
    val scored = docs.map { case (text, lang, _) =>
      val ws = words(text)
      val nStop = ws.count(Stop)
      (math.min(nStop * 20L / ws.length, 19L), lang == "en")
    }
    def h(p: Long, q: Long): Double = {
      val n = p + q
      def term(c: Long): Double =
        if (c == 0 || n == 0) 0.0
        else snap(-(c.toDouble / n) * snap(math.log(c.toDouble / n), 6), 6)
      snap((term(p) + term(q)) / Ln2, 6)
    }
    val pT = scored.count(_._2).toLong
    val nT = scored.length - pT
    val gains = (0L to 19L).map { thr =>
      val hiP = scored.count(s => s._1 >= thr && s._2).toLong
      val hiN = scored.count(s => s._1 >= thr && !s._2).toLong
      val (loP, loN) = (pT - hiP, nT - hiN)
      val (nHi, nLo) = (hiP + hiN, loP + loN)
      val nAll = nHi + nLo
      val children = snap(
        (nHi.toDouble / nAll) * h(hiP, hiN) + (nLo.toDouble / nAll) * h(loP, loN), 6)
      (thr, nHi, nLo, snap(h(pT, nT) - children, 6))
    }
    val best = gains.map(_._4).max
    val got = q("eval_best_split").collect()
    assert(got.length == 20)
    got.foreach { r =>
      val (thr, nHi, nLo, gain) = gains(r.getLong(0).toInt)
      assert(r.getLong(1) == nHi && r.getLong(2) == nLo, s"thr $thr sizes")
      assert(math.abs(r.getDouble(3) - gain) < 1e-9, s"thr $thr gain")
      assert(r.getInt(4) == (if (gain == best) 1 else 0), s"thr $thr best flag")
    }
    assert(best > 0.0, "fixture must have a positive-gain split")
    assert(got.map(_.getInt(4)).sum >= 1)
  }

  // -------------------------------------------------------------
  test("trimmed/winsorized means match a direct interpolated-percentile model") {
    def pct(sorted: Vector[Double], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted.last
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val got = q("agg_trimmed_mean").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    events.groupBy(_._1).foreach { case (et, rows) =>
      val vs = rows.map(_._2).toVector
      val sorted = vs.sorted
      val lo = snap(pct(sorted, 0.05), 4)
      val hi = snap(pct(sorted, 0.95), 4)
      def decSum(xs: Seq[Double]): BigDecimal =
        xs.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      val kept = vs.filter(v => v >= lo && v <= hi)
      val wins = vs.map(v => math.max(lo, math.min(v, hi)))
      val (gn, gmean, glo, ghi, gkept, gtrim, gwins) = got(et)
      assert(gn == vs.length.toLong, s"$et n")
      assert(math.abs(gmean - snap(decSum(vs).toDouble / vs.length, 4)) < 1e-9, s"$et mean")
      assert(math.abs(glo - lo) < 1e-9 && math.abs(ghi - hi) < 1e-9, s"$et thresholds")
      assert(gkept == kept.length.toLong, s"$et n_kept")
      assert(math.abs(gtrim - snap(decSum(kept).toDouble / kept.length, 4)) < 1e-9, s"$et trimmed")
      assert(math.abs(gwins - snap(decSum(wins).toDouble / wins.length, 4)) < 1e-9, s"$et winsor")
      // the trim must bite: something was actually excluded
      assert(kept.length < vs.length, s"$et trim excluded nothing")
    }
  }

  test("attribution join is an equi hash/merge join on user, never a nested loop") {
    val p = graft.SparkEntry.queries("events_attribution_linear")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "purchase-touch pairing must key on user_id with the hour range as residual: " + p.take(600))
  }

  test("Theil-Sen / Mann-Kendall: slope median and S statistic match a direct model") {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("ts").cast("long") / 86400L).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = q("eval_theilsen_trend").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getDouble(5))).toMap
    got.foreach { case (et, (nDays, mkS, senSlope)) =>
      val days = daily.collect { case ((t, d), n) if t == et => (d, n) }.toSeq.sortBy(_._1)
      assert(nDays === days.length.toLong, s"$et n_days")
      val pairs = for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield (days(i), days(j))
      val s = pairs.map { case ((_, n1), (_, n2)) => java.lang.Long.signum(n2 - n1).toLong }.sum
      assert(mkS === s, s"$et mk_s")
      val slopes = pairs.map { case ((d1, n1), (d2, n2)) =>
        snap((n2 - n1).toDouble / (d2 - d1), 6)
      }.sorted
      val m = slopes.length
      val med =
        if (m % 2 == 1) slopes(m / 2) else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      assert(math.abs(senSlope - snap(med, 6)) < 1e-9, s"$et sen_slope")
      // robustness: corrupting ONE day by 10x moves the mean slope but
      // not the median-of-pairs beyond the pair fraction it touches
      val corrupted = days.updated(0, (days.head._1, days.head._2 * 10))
      val cSlopes = (for {
        i <- corrupted.indices; j <- (i + 1) until corrupted.length
      } yield snap((corrupted(j)._2 - corrupted(i)._2).toDouble /
        (corrupted(j)._1 - corrupted(i)._1), 6)).sorted
      val cMed = if (m % 2 == 1) cSlopes(m / 2) else (cSlopes(m / 2 - 1) + cSlopes(m / 2)) / 2.0
      val spread = slopes.last - slopes.head
      assert(math.abs(cMed - med) <= spread,
        s"$et median blew up under single-day corruption: $med -> $cMed")
    }
  }

  test("Count-Min: estimates never underestimate, bound column is exact, top-20 is the exact top") {
    val rows = q("agg_countmin_audit").collect()
    assert(rows.length === math.min(20,
      Tables.events(spark, dir).select(col("user_id")).distinct().count()).toInt)
    val exact = Tables.events(spark, dir).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTotal = exact.values.sum
    val top = exact.toSeq.sortBy { case (u, n) => (-n, u) }.take(20).toMap
    rows.foreach { r =>
      val (u, nEx, nEst, over) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(top(u) === nEx, s"user $u exact count")
      assert(nEst >= nEx, s"user $u CM underestimated: $nEst < $nEx")
      assert(over === nEst - nEx)
      assert(r.getDouble(5) === snap(math.E / 64.0 * nTotal, 2), "eps_n")
      assert(r.getBoolean(6) === (over <= math.E / 64.0 * nTotal), "within_bound")
    }
  }

  private def md5hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("permutation test: hash relabelings and the extreme count match a direct model") {
    val row = q("eval_permutation_test").collect().head
    val (nA, nB, obsDiff, b, nExtreme, p) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getInt(3),
        row.getLong(4), row.getDouble(5))
    val byDoc = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val top2 = byDoc.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (s, n) => (-n, s) }.take(2).map(_._1)
    val slice = byDoc.filter(d => top2.contains(d._2))
    val a = slice.filter(_._2 == top2.head)
    val bb = slice.filter(_._2 == top2(1))
    assert(nA === a.length.toLong && nB === bb.length.toLong)
    val obs = snap(a.map(_._3).sum.toDouble / a.length
      - bb.map(_._3).sum.toDouble / bb.length, 6)
    assert(obsDiff === obs, "observed difference")
    val extreme = (1 to b).count { perm =>
      val (g0, g1) = slice.partition(d => md5hex8((d._1 * 1009 + perm).toString) % 2 == 0)
      val stat = snap(g0.map(_._3).sum.toDouble / g0.length
        - g1.map(_._3).sum.toDouble / g1.length, 6)
      math.abs(stat) >= math.abs(obs)
    }
    assert(nExtreme === extreme.toLong, "extreme count under hash relabelings")
    assert(p === snap((extreme + 1).toDouble / (b + 1), 6))
    // a valid p-value in the add-one Monte-Carlo range
    assert(p >= 1.0 / (b + 1) && p <= 1.0)
  }

  test("DiD readout: four-cell decomposition matches a direct model; A/A reads null") {
    val row = q("events_did_readout").collect().head
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    def cellOf(u: Long, sec: Long): (Int, Int) =
      ((md5hex8(u.toString) % 2).toInt, if (sec >= mid) 1 else 0)
    val cells = evs.groupBy(e => cellOf(e._1, e._2))
    def m(a: Int, p: Int): Double = {
      val vs = cells((a, p)).map(e =>
        BigDecimal(e._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      snap(vs.sum.toDouble / vs.length, 6)
    }
    assert(row.getLong(0) === cells((0, 0)).length.toLong, "n00")
    assert(row.getLong(3) === cells((1, 1)).length.toLong, "n11")
    assert(row.getDouble(4) === m(0, 0), "m00")
    assert(row.getDouble(7) === m(1, 1), "m11")
    val did = snap(m(1, 1) - m(1, 0) - (m(0, 1) - m(0, 0)), 6)
    assert(row.getDouble(8) === did, "did")
    // hash-split A/A: the true effect is zero, so |t| must be modest
    assert(math.abs(row.getDouble(10)) < 4.0,
      s"A/A split should not read a strong effect: t=${row.getDouble(10)}")
  }

  test("stats plans: corpus reduces before the tiny-frame math") {
    // MI: the only exchange over corpus-sized data is the contingency
    // reduction — the window math runs on the |S|x|L| frame
    val p = q("eval_mi_association").queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_"),
      "contingency build must partial-aggregate map-side: " + p.take(400))
    // trimmed mean: thresholds broadcast back, no sort of raw events
    val t = q("agg_trimmed_mean").queryExecution.executedPlan.toString
    assert(t.contains("BroadcastHashJoin"), "thresholds must broadcast: " + t.take(400))
    assert(!t.contains("windowspecdefinition"), "no window over raw events: " + t.take(400))
  }

  // -------------------------------------------------------------
  test("Mann-Whitney U: doubled-rank statistics match a direct tie-averaged-rank model") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.table(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val top2 = bySrc.toSeq.sortBy { case (s, n) => (-n, s) }.take(2)
    val (srcA, srcB) = (top2(0)._1, top2(1)._1)
    val a = docs.filter(_._1 == srcA).map(_._2)
    val b = docs.filter(_._1 == srcB).map(_._2)
    val pooled = (a ++ b).sorted
    // doubled tie-averaged rank of value v: 2*count(below) + t + 1
    val tieCount = pooled.groupBy(identity).view.mapValues(_.length).toMap
    val below = {
      val vs = pooled.distinct.sorted
      var c = 0L
      vs.map { v => val r = v -> c; c += tieCount(v); r }.toMap
    }
    def dblRank(v: Long): Long = 2 * below(v) + tieCount(v) + 1
    val r2a = a.map(dblRank).sum
    val (na, nb) = (a.length.toLong, b.length.toLong)
    val uA = (r2a - na * (na + 1)).toDouble / 2.0
    val tieTerm = tieCount.values.map(t => t.toLong * t * t - t).sum
    val nn = na + nb
    val varU = snap(na.toDouble * nb / 12.0 *
      ((nn + 1).toDouble - tieTerm.toDouble / (nn * (nn - 1))), 6)
    val z = snap((uA - na.toDouble * nb / 2.0) / math.sqrt(varU), 6)
    val r = q("eval_mannwhitney").collect().head
    assert(r.getString(0) === srcA && r.getString(1) === srcB)
    assert(r.getLong(2) === na && r.getLong(3) === nb)
    assert(math.abs(r.getDouble(4) - uA) < 1e-9, s"u_a ${r.getDouble(4)} vs $uA")
    assert(r.getLong(5) === tieTerm, "tie_term")
    assert(math.abs(r.getDouble(6) - varU) < 1e-9, "var_u")
    assert(math.abs(r.getDouble(7) - z) < 1e-9, s"mw_z ${r.getDouble(7)} vs $z")
    // the rank-sum identity: U_A + U_B = n_a * n_b
    val r2b = b.map(dblRank).sum
    val uB = (r2b - nb * (nb + 1)).toDouble / 2.0
    assert(math.abs(uA + uB - na.toDouble * nb) < 1e-9, "U_A + U_B = n_a*n_b")
  }

  // -------------------------------------------------------------
  test("Kendall tau-b: dominance-counted C/D equal the brute-force pair enumeration") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.table(spark, dir, "documents")
      .select(col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // the query coarsens length onto the fixed a-priori grid (r17):
    // bucket width 16, cap 4095 — the model must compare on the same axis
    val pts = rows.map { case (text, len) =>
      ((BigDecimal(quality(text)) * 1000).toLongExact, math.min(len / 16L, 4095L)) }
    var c = 0L; var d = 0L
    var i = 0
    while (i < pts.length) {
      var j = i + 1
      while (j < pts.length) {
        val dq = java.lang.Long.compare(pts(i)._1, pts(j)._1)
        val dl = java.lang.Long.compare(pts(i)._2, pts(j)._2)
        if (dq * dl > 0) c += 1 else if (dq * dl < 0) d += 1
        j += 1
      }
      i += 1
    }
    val n = pts.length.toLong
    val n0 = n * (n - 1) / 2
    val tq = pts.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val tl = pts.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val tau = snap((c - d).toDouble / (math.sqrt((n0 - tq).toDouble) * math.sqrt((n0 - tl).toDouble)), 6)
    val r = q("eval_kendall_tau").collect().head
    assert(r.getLong(0) === n && r.getLong(1) === n0)
    assert(r.getLong(2) === c, s"concordant ${r.getLong(2)} vs $c")
    assert(r.getLong(3) === d, s"discordant ${r.getLong(3)} vs $d")
    assert(r.getLong(4) === tq && r.getLong(5) === tl, "tie terms")
    assert(math.abs(r.getDouble(6) - tau) < 1e-9, s"tau_b ${r.getDouble(6)} vs $tau")
    // identity: C + D + (pairs tied on either axis, minus both) = N0
    val tboth = pts.groupBy(identity).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(c + d + tq + tl - tboth === n0, "pair accounting identity")
  }
}
