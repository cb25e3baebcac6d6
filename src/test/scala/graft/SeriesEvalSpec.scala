package graft

import graft.queries.{QualityQueries, TimeSeriesQueries}
import graft.sources.Tables

/** Driver-side first-principles replays of the round-15 time-series /
  * audit additions (OHLC candles, CUSUM changepoint, lagged
  * autocorrelation, Benford first-digit audit) — the EvalSpec stance:
  * the DuckDB oracle checks engine-vs-SQL, these pin the semantics
  * against an independent in-process recomputation.
  */
class SeriesEvalSpec extends SparkSpec {

  // (event_type, day ISO string, epoch micros, event_id, cents)
  private lazy val ev: Seq[(String, String, Long, Long, Long, Long)] =
    Tables.events(spark, sfDir).selectExpr("event_type",
      "cast(cast(date_trunc('day', ts) as date) as string)",
      "unix_micros(ts)", "event_id", "user_id",
      "cast(cast(value as decimal(18,2)) * 100 as bigint)")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("ohlc: struct-extrema candles equal the sort-based replay") {
    val ticks = ev.filter(_._1 == "view")
      .map(t => (t._5 % 25, t._2, t._3, t._4, t._6)) // symbol, day, us, id, c
    val expected = ticks.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val ordered = rows.sortBy(t => (t._3, t._4))
      k -> ((ordered.head._5, rows.map(_._5).max, rows.map(_._5).min,
        ordered.last._5, rows.size.toLong, rows.map(_._5).sum))
    }
    val got = TimeSeriesQueries.queries("q_x_ohlc")(spark, sfDir)
      .selectExpr("symbol", "cast(day as string)", "open_c", "high_c",
        "low_c", "close_c", "n_ticks", "vol_c")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("cusum: mean-free cumulative peaks where the replay says; last cum is 0") {
    val daily = ev.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._6).sum).toSeq
      .map { case ((typ, d), x) => (typ, d, x) }
    val expected = daily.groupBy(_._1).map { case (typ, rows) =>
      val sorted = rows.sortBy(_._2)
      val n = sorted.size.toLong
      val sx = sorted.map(_._3).sum
      val cums = sorted.scanLeft(0L)((acc, r) => acc + (n * r._3 - sx)).tail
      assert(cums.last == 0L, s"$typ: cum must close at zero")
      val withDay = sorted.map(_._2).zip(cums)
      val maxAbs = cums.map(math.abs).max
      val cpDay = withDay.filter(p => math.abs(p._2) == maxAbs).map(_._1).min
      typ -> ((n, cpDay, maxAbs))
    }
    val got = TimeSeriesQueries.queries("q_x_cusum")(spark, sfDir)
      .selectExpr("event_type", "n_days", "cast(cp_day as string)", "max_abs_dev")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("autocorr: exact-moment pearson pieces equal the calendar-lag replay") {
    val daily = ev.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._6).sum / 100).toMap
    val types = daily.keys.map(_._1).toSet
    val expected = (for {
      typ <- types.toSeq; lag <- Seq(1L, 7L)
      pairs = daily.collect { case ((t, d), x) if t == typ =>
        val d2 = java.time.LocalDate.parse(d).plusDays(lag).toString
        daily.get((t, d2)).map(y => (x, y))
      }.flatten.toSeq
      if pairs.nonEmpty
    } yield {
      val p = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(t => t._1 * t._2).sum
      val sxx = pairs.map(t => t._1 * t._1).sum
      val syy = pairs.map(t => t._2 * t._2).sum
      val (num, den1, den2) = (p * sxy - sx * sy, p * sxx - sx * sx, p * syy - sy * sy)
      val corr = if (den1 > 0 && den2 > 0)
        Some(num.toDouble / (math.sqrt(den1.toDouble) * math.sqrt(den2.toDouble)))
      else None
      (typ, lag) -> ((p, num, den1, den2, corr))
    }).toMap
    val got = TimeSeriesQueries.queries("q_x_autocorr")(spark, sfDir)
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      }.toMap
    assert(got == expected && got.nonEmpty)
  }

  test("decay_topk: guarded bit-shift decay replay; top-10 order pinned") {
    val days = ev.map(_._2)
    val mx = java.time.LocalDate.parse(days.max)
    val scores = ev.groupBy(_._5).map { case (user, rows) =>
      val s = rows.map { r =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(r._2), mx)
        if (age >= 63) 0L else 1048576L >> age
      }.sum
      (user, s, rows.size.toLong)
    }.toSeq
    val expected = scores.sortBy(t => (-t._2, t._1)).take(10)
    val got = graft.queries.BehaviorQueries.queries("q_x_decay_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("join_card: exact twin replays; CMS estimate is one-sided (est >= exact)") {
    val v = ev.filter(_._1 == "view").groupBy(_._5).view.mapValues(_.size.toLong)
    val p = ev.filter(_._1 == "purchase").groupBy(_._5).view.mapValues(_.size.toLong)
    val exact = v.keys.toSeq.flatMap(u => p.get(u).map(_ * v(u))).sum
    val r = graft.queries.SketchQueries.queries("q_x_join_card")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_a")) == v.values.sum)
    assert(r.getLong(r.fieldIndex("n_b")) == p.values.sum)
    assert(r.getLong(r.fieldIndex("exact_join")) == exact)
    val est = r.getLong(r.fieldIndex("est_join"))
    assert(est >= exact, "CMS inner product must never undershoot")
    assert(r.getLong(r.fieldIndex("overest_bp")) ==
      (est - exact) * 10000 / math.max(exact, 1L))
  }

  test("linkpred: wedge/jaccard replay over the naive co-part graph") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (o(r.getLong(0)), r.getLong(1))).distinct
    val byCust = cp.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val custs = byCust.keys.toSeq.sorted
    val edges = (for {
      i <- custs.indices; j <- (i + 1) until custs.size
      if (byCust(custs(i)) & byCust(custs(j))).size >= 3
    } yield (custs(i), custs(j))).toSet
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) { nbrs(a) = nbrs(a) + b; nbrs(b) = nbrs(b) + a }
    def adj(n: Long): Set[Long] = nbrs(n)
    val deg = custs.map(c => c -> adj(c).size.toLong).toMap
    val expected = (for {
      i <- custs.indices; j <- (i + 1) until custs.size
      u = custs(i); v = custs(j)
      if !edges((u, v))
      common = (adj(u) & adj(v)).size.toLong
      if common >= 1
    } yield (u, v, common, deg(u), deg(v),
      common * 10000 / (deg(u) + deg(v) - common)))
      .sortBy(t => (-t._6, t._1, t._2)).take(100)
    val got = graft.queries.GraphQueries.queries("q_x_linkpred")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("assortativity: symmetric-moment pearson replay over the co-part graph") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (o(r.getLong(0)), r.getLong(1))).distinct
    val byCust = cp.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val custs = byCust.keys.toSeq.sorted
    val edges = for {
      i <- custs.indices; j <- (i + 1) until custs.size
      if (byCust(custs(i)) & byCust(custs(j))).size >= 3
    } yield (custs(i), custs(j))
    val directed = edges ++ edges.map(e => (e._2, e._1))
    val deg = directed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p = directed.size.toLong
    val sx = directed.map(e => deg(e._1)).sum
    val sxy = directed.map(e => deg(e._1) * deg(e._2)).sum
    val sxx = directed.map(e => deg(e._1) * deg(e._1)).sum
    val (num, den) = (p * sxy - sx * sx, p * sxx - sx * sx)
    val r = graft.queries.GraphQueries.queries("q_x_assortativity")(spark, sfDir)
      .collect().head
    assert(r.getLong(0) == p && r.getLong(1) == num && r.getLong(2) == den)
    if (den != 0) assert(r.getDouble(3) == num.toDouble / den.toDouble)
    // sanity: the symmetric identity sx == sy held by construction
    assert(directed.map(e => deg(e._2)).sum == sx)
  }

  test("collocations: integer PMI-ratio lift replay with the support cut") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("text").collect().map(_.getString(0))
    val tokLists = texts.map(_.trim.split("\\s+").toSeq)
    val toks = tokLists.flatten.filter(_.nonEmpty)
    val n = toks.size.toLong
    val c1 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = tokLists.filter(_.size >= 2)
      .flatMap(ws => ws.zip(ws.tail)).groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 >= 5L)
    val expected = c2.map { case ((w1, w2), c12) =>
      (w1, w2, c12, c1(w1), c1(w2), c12 * 10000L * n / (c1(w1) * c1(w2)))
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = graft.queries.ExtTextQueries.queries("q_x_collocations")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("feature_hash: independent md5 replay; collisions cancel to exact sparsity") {
    def md5l(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseUnsignedLong(
        d.map("%02x".format(_)).mkString.take(16), 16)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map { t =>
        ((id, java.lang.Math.floorMod(md5l("fh:" + t), 1024L)),
          if (java.lang.Math.floorMod(md5l("fhs:" + t), 2L) == 0L) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap
    val got = graft.queries.ExtTextQueries.queries("q_x_feature_hash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("churn_labels: future-side lead labels with last-week censoring") {
    def week(day: String): String =
      java.time.LocalDate.parse(day)
        .`with`(java.time.DayOfWeek.MONDAY).toString
    val weekly = ev.groupBy(t => (t._5, week(t._2)))
      .map { case ((u, w), rows) => (u, w, rows.size.toLong, rows.map(_._6).sum) }
      .toSeq
    val mxw = weekly.map(_._2).max
    val byUser = weekly.groupBy(_._1)
    val expected = (for {
      (u, rows) <- byUser.toSeq
      sorted = rows.sortBy(_._2)
      (r, i) <- sorted.zipWithIndex
      if r._2 < mxw
    } yield {
      val next = if (i + 1 < sorted.size) Some(sorted(i + 1)._2) else None
      val wk1 = java.time.LocalDate.parse(r._2).plusDays(7).toString
      (u, r._2, r._3, r._4, next.forall(_ != wk1))
    }).toSet
    val got = graft.queries.BehaviorQueries.queries("q_x_churn_labels")(spark, sfDir)
      .selectExpr("user_id", "cast(obs_week as string)",
        "n_events", "cents", "churned")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == expected && got.nonEmpty)
    // no churn-existence assert: at sf0.001 every user happens to be
    // active in consecutive weeks (the label MECHANICS are pinned by the
    // exact-set equality above; the sf0.01 driver row has churned=true
    // rows — 600 labels there)
  }

  test("kmv_distinct: bottom-k replay; sub-k streams degenerate to exact") {
    def md5l(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseUnsignedLong(
        d.map("%02x".format(_)).mkString.take(16), 16)
    }
    val M = 4611686018427387904L
    val byType = ev.groupBy(_._1)
    val expected = byType.map { case (t, rows) =>
      val users = rows.map(_._5).distinct
      val hs = users.map(u => java.lang.Math.floorMod(md5l("kmv:" + u), M))
        .distinct.sorted
      val bottom = hs.take(64)
      val est =
        if (bottom.size < 64) bottom.size.toLong
        else ((BigInt(63) * BigInt(M)) / BigInt(bottom.last)).toLong
      t -> ((users.size.toLong, bottom.size.toLong, bottom.last, est,
        (est - users.size).abs * 10000 / users.size))
    }
    val got = graft.queries.SketchQueries.queries("q_x_kmv_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("compaction_plan: prefix-sum bins respect the first-fit overshoot bound") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "cast(n_chars as bigint)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ordered = docs.sortBy(t => (-t._2, t._1))
    var cum = 0L
    val expected = ordered.map { case (id, b) =>
      val bin = cum / 4096; cum += b; (id, b, bin)
    }.toSet
    val got = graft.queries.LayoutQueries.queries("q_x_compaction_plan")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
    // classical streaming-first-fit bound: a bin never exceeds
    // target + one file
    val maxFile = docs.map(_._2).max
    val perBin = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(perBin.values.forall(_ <= 4096L + maxFile))
  }

  test("gini: closed-form tied-block ranks equal the naive sorted formula") {
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._6).sorted
      val n = xs.size.toLong
      val sx = xs.sum
      val r2x = xs.zipWithIndex.map { case (x, i) => 2L * (i + 1) * x }.sum
      t -> ((n, sx, r2x - (n + 1) * sx,
        (r2x - (n + 1) * sx).toDouble / (n * sx).toDouble))
    }
    val got = graft.queries.QualityQueries.queries("q_x_gini")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected && got.nonEmpty)
    assert(got.values.forall(v => v._4 >= 0.0 && v._4 < 1.0))
  }

  test("streak: gaps-and-islands replay; top-20 order pinned") {
    val days = ev.map(t => (t._5, t._2)).distinct
    val expected = days.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.map(_._2).sorted.map(java.time.LocalDate.parse)
      sorted.zipWithIndex
        .groupBy { case (d, i) => d.toEpochDay - i }
        .values.map { isl =>
          val ds = isl.map(_._1)
          (u, ds.size.toLong, ds.min.toString, ds.max.toString)
        }
    }.sortBy(t => (-t._2, t._1, t._3)).take(20)
    val got = graft.queries.BehaviorQueries.queries("q_x_streak")(spark, sfDir)
      .selectExpr("user_id", "streak_days", "cast(streak_start as string)",
        "cast(streak_end as string)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("survival: risk sets, censoring, and integer hazard replay") {
    // ev: (type, day, micros, event_id, user, cents)
    val byUser = ev.groupBy(_._5)
    val horizon = ev.map(_._2).max
    val durations = byUser.toSeq.flatMap { case (u, rows) =>
      val views = rows.filter(_._1 == "view")
      if (views.isEmpty) None
      else {
        val fv = views.minBy(r => (r._3, r._4))
        val purch = rows.filter(r => r._1 == "purchase" && r._3 >= fv._3)
        def days(a: String, b: String) =
          java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
        if (purch.nonEmpty)
          Some((days(fv._2, purch.map(_._2).min), true))
        else Some((days(fv._2, horizon), false))
      }
    }
    val total = durations.size.toLong
    val ts = durations.map(_._1).distinct.sorted
    var cumExit = 0L; var cumHaz = 0L
    val expected = ts.map { t =>
      val d = durations.count(x => x._1 == t && x._2).toLong
      val c = durations.count(x => x._1 == t && !x._2).toLong
      val nRisk = total - cumExit
      val term = d * 1000000L / nRisk
      cumExit += d + c; cumHaz += term
      (t, nRisk, d, c, term, cumHaz)
    }.toSet
    val got = graft.queries.BehaviorQueries.queries("q_x_survival")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("modularity: cross-multiplied fold replays from the engine's labels") {
    // LPA itself is pinned in GraphSpec; here the MODULARITY fold is
    // replayed on the driver from the same labels and edge set
    val o = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = o.groupBy(_._2).map { case (sp, xs) => sp -> xs.map(_._1).toSet }
    val supps = bySupp.keys.toSeq.sorted
    val edges = (for {
      i <- supps.indices; j <- (i + 1) until supps.size
      if (bySupp(supps(i)) & bySupp(supps(j))).size >= 9
    } yield (supps(i), supps(j))).toSet
    val labs = graft.operators.Graph.labelPropagation(
        spark.createDataFrame(edges.toSeq).toDF("a", "b"), "a", "b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.size.toLong
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val comms = labs.values.toSet
    val qNum = comms.toSeq.map { c =>
      val eC = edges.count(e => labs(e._1) == c && labs(e._2) == c).toLong
      val dC = labs.collect { case (n, l) if l == c => deg(n) }.sum
      4L * m * eC - dC * dC
    }.sum
    val r = graft.queries.GraphQueries.queries("q_x_modularity")(spark, sfDir)
      .collect().head
    assert(r.getLong(0) == comms.size && r.getLong(1) == m &&
      r.getLong(2) == qNum)
    assert(r.getDouble(3) == qNum.toDouble / (4.0 * m * m))
    assert(r.getDouble(3) >= -0.5 && r.getDouble(3) < 1.0)
  }

  test("ndcg: literal discount table is round(1e6/log2(i+1)); driver replay") {
    val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L)
    for (i <- 1 to 10)
      assert(disc(i - 1) ==
        math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0))), s"i=$i")
    val r = graft.queries.ExtTextQueries.queries("q_x_ndcg")(spark, sfDir)
      .collect().head
    val (dcg, idcg, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(bp == dcg * 10000 / idcg)
    assert(bp >= 0 && bp <= 10000, "NDCG must sit in [0, 1]")
    assert(idcg > 0)
  }

  test("map: identities hold — ap bounded by precision ceiling; hits consistent") {
    val r = graft.queries.ExtTextQueries.queries("q_x_map")(spark, sfDir)
      .collect().head
    val (nRel, hits10, ap) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(hits10 >= 0 && hits10 <= 10 && hits10 <= nRel)
    assert(ap >= 0 && ap <= 1000000L, "AP must sit in [0, 1] micro-units")
    // AP is 10^6 iff every relevant doc (up to 10) leads the ranking;
    // any miss in the prefix strictly lowers it
    if (hits10 < math.min(nRel, 10L)) assert(ap < 1000000L)
  }

  test("langid_eval: cells sum to the corpus; shares are exact row fractions") {
    val rows = graft.queries.ExtTextQueries.queries("q_x_langid_eval")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._3).sum == corpus, "every doc lands in exactly one cell")
    for ((lang, cells) <- rows.groupBy(_._1)) {
      val rowN = cells.map(_._3).sum
      cells.foreach { c =>
        assert(c._4 == c._3 * 10000 / rowN, s"share mismatch in $lang")
        assert(c._5 == (c._1 == c._2))
      }
    }
    // the lexicon gate must be BETTER than chance on its own corpus
    val correct = rows.filter(_._5).map(_._3).sum
    assert(correct * 5 > corpus, s"accuracy ${correct}/$corpus below chance")
  }

  test("mase and cross_corr: calendar-lag replays over the shared daily series") {
    val daily = ev.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._6).sum).toMap
    def plus(d: String, k: Int) = java.time.LocalDate.parse(d).plusDays(k).toString
    // mase replay
    val types = daily.keys.map(_._1).toSet
    val expMase = types.map { t =>
      def diffs(k: Int) = daily.collect {
        case ((tt, d), x) if tt == t && daily.contains((t, plus(d, k))) =>
          (daily((t, plus(d, k))) - x).abs
      }.toSeq
      val (d1, d7) = (diffs(1), diffs(7))
      val ratio = if (d1.sum > 0 && d7.nonEmpty)
        Some(d7.sum * d1.size * 10000L / (d1.sum * d7.size)) else None
      t -> ((d1.size.toLong, d1.sum, d7.size.toLong, d7.sum, ratio))
    }.toMap
    val gotMase = graft.queries.TimeSeriesQueries.queries("q_x_mase")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(gotMase == expMase && gotMase.nonEmpty)
    // cross_corr replay (lag 0..3, views lead purchases)
    val wu = daily.collect { case ((t, d), x) if t == "view" => d -> x / 100 }.toMap
    val pu = daily.collect { case ((t, d), x) if t == "purchase" => d -> x / 100 }.toMap
    val expCc = (0L to 3L).flatMap { k =>
      val pairs = wu.toSeq.flatMap { case (d, x) =>
        pu.get(plus(d, k.toInt)).map(y => (x, y)) }
      if (pairs.isEmpty) None else {
        val p = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(q => q._1 * q._2).sum
        val sxx = pairs.map(q => q._1 * q._1).sum
        val syy = pairs.map(q => q._2 * q._2).sum
        Some(k -> ((p, p * sxy - sx * sy, p * sxx - sx * sx, p * syy - sy * sy)))
      }
    }.toMap
    val gotCc = graft.queries.TimeSeriesQueries.queries("q_x_cross_corr")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(gotCc == expCc && gotCc.nonEmpty)
  }

  test("drift_ks: cross-multiplied sup-norm equals the naive two-CDF scan") {
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val ref = rows.filter(r => r._2.substring(8, 10).toInt <= 15).map(_._6)
      val cur = rows.filter(r => r._2.substring(8, 10).toInt > 15).map(_._6)
      val vs = (ref ++ cur).distinct.sorted
      val (n1, n2) = (ref.size.toLong, cur.size.toLong)
      val num = vs.map(v =>
        (ref.count(_ <= v).toLong * n2 - cur.count(_ <= v).toLong * n1).abs).max
      t -> ((n1, n2, num,
        if (n1 > 0 && n2 > 0) Some(num.toDouble / (n1 * n2).toDouble) else None))
    }
    val got = graft.queries.QualityQueries.queries("q_x_drift_ks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got == expected && got.nonEmpty)
    assert(got.values.forall(v => v._4.forall(k => k >= 0.0 && k <= 1.0)))
  }

  test("hhi: cross-multiplied share squares replay; bounded by 1/n..1") {
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val v = rows.groupBy(_._5).view.mapValues(_.map(_._6).sum).values.toSeq
      val total = v.sum
      t -> ((v.size.toLong, total, v.map(x => x * x).sum,
        v.map(x => x * x).sum.toDouble / (total.toDouble * total.toDouble)))
    }
    val got = graft.queries.QualityQueries.queries("q_x_hhi")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expected && got.nonEmpty)
    got.values.foreach { case (n, _, _, h) =>
      assert(h >= 1.0 / n - 1e-12 && h <= 1.0, s"HHI out of [1/n, 1]: $h")
    }
  }

  test("benford: universe-complete digit census with exact ppm deviations") {
    val pos = ev.filter(_._6 > 0).map(t => (t._1, t._6.toString.take(1).toLong))
    val ppm = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
      5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)
    assert(ppm.values.sum == 1000000L) // the table is a probability measure
    val n = pos.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = (for { (typ, nt) <- n.toSeq; d <- 1L to 9L } yield {
      val obs = pos.count(p => p._1 == typ && p._2 == d).toLong
      (typ, d) -> ((obs, nt, ppm(d), math.abs(obs * 1000000L - ppm(d) * nt)))
    }).toMap
    val got = QualityQueries.queries("q_x_benford")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected && got.nonEmpty)
    assert(got.size == n.size * 9) // zero-count digits restored
  }
}
