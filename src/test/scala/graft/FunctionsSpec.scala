package graft

import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit tests for the custom Catalyst functions and the reference-semantics
  * shims (SURVEY.md §2.5/§2.7). Mirrors the reference's expression suites
  * (spear-core/src/test/scala/spear/expressions/). */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("product: multiply-reduce, null-skipping, null on empty (numeric.scala:44-50)") {
    val df = Seq(
      ("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(5.0)),
      ("c", None)
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(GraftFunctions.product($"v").as("p"))
      .orderBy("k").collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 6.0), ("b", 5.0), ("c", null)))
  }

  test("product participates in partial aggregation (declarative, codegen)") {
    val df = spark.range(1, 11).repartition(4)
      .select(lit("g").as("k"), $"id".cast("double").as("v"))
    val got = df.groupBy($"k").agg(GraftFunctions.product($"v")).collect()
    assert(got.head.getDouble(1) == 3628800.0) // 10!
  }

  test("andStrict/orStrict: reference null-strict logic vs Spark Kleene logic") {
    // full (T, F, N)^2 matrix; spear nullSafeEvaluate yields NULL whenever
    // either operand is NULL (logicalOperators.scala:15-28)
    val vals = Seq(Some(true), Some(false), None)
    val df = (for (a <- vals; b <- vals) yield (a, b)).toDF("a", "b")
    val rows = df.select($"a", $"b",
        GraftFunctions.andStrict($"a", $"b").as("sand"),
        GraftFunctions.orStrict($"a", $"b").as("sor"),
        ($"a" && $"b").as("kand"),
        ($"a" || $"b").as("kor"))
      .collect()
    def v(r: org.apache.spark.sql.Row, i: Int): Option[Boolean] =
      if (r.isNullAt(i)) None else Some(r.getBoolean(i))
    rows.foreach { r =>
      val (a, b) = (v(r, 0), v(r, 1))
      val expectStrictAnd =
        if (a.isEmpty || b.isEmpty) None else Some(a.get && b.get)
      val expectStrictOr =
        if (a.isEmpty || b.isEmpty) None else Some(a.get || b.get)
      assert(v(r, 2) == expectStrictAnd, s"andStrict($a,$b)")
      assert(v(r, 3) == expectStrictOr, s"orStrict($a,$b)")
    }
    // and the documented divergence: Kleene short-circuits where strict can't
    val k = rows.find(r => v(r, 0).isEmpty && v(r, 1) == Some(false)).get
    assert(v(k, 4) == Some(false) && v(k, 2) == None)   // null AND false
    val k2 = rows.find(r => v(r, 0).isEmpty && v(r, 1) == Some(true)).get
    assert(v(k2, 5) == Some(true) && v(k2, 3) == None)  // null OR true
  }

  test("greatest/least skip nulls; all-null yields null (arithmetics.scala:126-156 parity)") {
    val df = Seq(
      (Some(5), Some(3)), (None, Some(3)), (Some(5), None),
      (None: Option[Int], None: Option[Int])
    ).toDF("a", "b")
    val got = df.select(greatest($"a", $"b"), least($"a", $"b")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0),
                 if (r.isNullAt(1)) null else r.getInt(1)))
    // spear treats null as smallest for Greatest / largest for Least — the
    // observable results coincide with Spark's null-skipping on every input
    assert(got.toSeq == Seq((5, 3), (3, 3), (5, 5), (null, null)))
  }

  test("stringToBooleanRef: spear truthy/falsy word matrix, null, error on junk") {
    // matrix patterned on spear CastSuite over Cast.scala:129-146
    val cases = Seq(
      "yes" -> true, "Y" -> true, "TRUE" -> true, "t" -> true, "On" -> true,
      "no" -> false, "N" -> false, "False" -> false, "f" -> false, "OFF" -> false)
    val df = cases.map(_._1).toDF("s")
    val got = df.select($"s", GraftFunctions.stringToBooleanRef($"s")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == cases.toMap)
    // NULL propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.stringToBooleanRef($"s")).collect().head
    assert(n.isNullAt(0))
    // spear errors on words outside the sets ("1" is valid for Spark's own
    // cast but a TypeCastException in spear)
    intercept[Exception] {
      Seq("1").toDF("s").select(GraftFunctions.stringToBooleanRef($"s")).collect()
    }
  }

  test("numberToBooleanRef: C-style truthiness incl. negatives, null propagates") {
    val got = Seq[Option[Int]](Some(0), Some(1), Some(-5), Some(42), None).toDF("i")
      .select(GraftFunctions.numberToBooleanRef($"i")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(false, true, true, true, null))
  }

  test("TopKLongAgg: imperative Aggregator — top-k desc, bounded buffer, partial agg") {
    val agg = new graft.functions.TopKLongAgg(3)
    // unit-level buffer semantics (update/merge/result of the reference's
    // ImperativeAggregateFunction contract)
    val buf = Seq(5L, 1L, 9L, 7L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
    assert(agg.finish(buf).toSeq == Seq(9L, 7L, 5L))
    val merged = agg.merge(Array(1L, 2L, 9L), Array(3L, 8L, 10L))
    assert(agg.finish(merged).toSeq == Seq(10L, 9L, 8L))
    // end-to-end through udaf with multiple partitions (partial agg + merge)
    val top3 = udaf(new graft.functions.TopKLongAgg(3))
    val got = spark.range(1, 101).repartition(7)
      .select(lit("g").as("k"), $"id")
      .groupBy($"k").agg(top3($"id").as("t"))
      .collect().head.getSeq[Long](1)
    assert(got.toSeq == Seq(100L, 99L, 98L))
  }

  test("dot/cosine/l2norm match scala reference computation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val rows = df.select(
      dotF32($"a", $"b"), cosineF32($"a", $"b"), l2normF32($"a")).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(math.abs(rows(0).getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-15)
    assert(math.abs(rows(0).getDouble(2) - math.sqrt(14)) < 1e-15)
    assert(rows(1).getDouble(1) == 0.0) // orthogonal
  }

  test("cosine of zero vector is null") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosineF32($"a", $"b")).collect().head.isNullAt(0))
  }

  test("minhash_signature: deterministic, k values, min-stability under superset") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L)),          // identical set -> identical signature
      (3L, Seq(10L, 20L, 30L, 40L))      // superset -> elementwise <=
    ).toDF("id", "h")
    val rows = df.select($"id", minhashSignature($"h", 16, 42L)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(rows(0)._2 == rows(1)._2)
    assert(rows(0)._2.size == 16)
    assert(rows(2)._2.zip(rows(0)._2).forall { case (sup, sub) => sup <= sub })
  }

  test("shingle_hashes: set size matches string-shingle construction; < n tokens -> empty") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),  // identical
      (3L, "quick brown the fox jumps"),  // permuted -> different shingles
      (4L, "too short"),                  // < 3 tokens
      (5L, "a a a a a")                   // repeated -> 1 distinct shingle
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        size(shingleHashesOf($"text", 3)).as("n_hash"),
        size(operators.Dedup.shingles($"text", 3)).as("n_str"))
      .orderBy("doc_id").collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"doc ${r.getLong(0)}: hash-set size ${r.getInt(1)} != string-set size ${r.getInt(2)}"))
    assert(got(3).getInt(1) == 0)
    assert(got(4).getInt(1) == 1)
    // identical texts produce identical hash sets
    val sets = docs.filter($"doc_id" <= 2)
      .select(shingleHashesOf($"text", 3)).collect().map(_.getSeq[Long](0))
    assert(sets(0) == sets(1))
  }

  test("word_ngrams kernel equals the compositional reference form") {
    val docs = Seq(
      (1L, "The Quick brown FOX jumps over the lazy dog"),
      (2L, "a b c a b c"),         // repeated trigrams kept (multiplicity)
      (3L, "too short"),           // < 3 tokens -> empty
      (4L, "  spaced    out\ttabs\nand newlines here "),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        wordNgramsOf($"text", 3).as("kernel"),
        operators.TextAnalysis.ngramsReference($"text", 3).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
    }
    // multiplicity: "a b c" appears twice in doc 2
    val d2 = got.find(_.getLong(0) == 2L).get.getSeq[String](1)
    assert(d2.count(_ == "a b c") == 2)
  }

  test("simhash64: identical texts collide, hamming64 = 0; disjoint texts differ") {
    val df = Seq(
      (1L, "spark catalyst optimizer rules engine"),
      (2L, "spark catalyst optimizer rules engine"),
      (3L, "completely different words entirely here")
    ).toDF("id", "text")
    val sh = df.select($"id", simhash64(tokenHashesOf($"text")).as("sh"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    val d = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.id" === 1 && $"b.id" === 2)
      .select(hamming64($"a.sh", $"b.sh")).collect().head.getInt(0)
    assert(d == 0)
  }

  test("bloom_agg / bloom_might_contain: zero false negatives, bounded FPR") {
    val keys = spark.range(0, 2000).select(xxhash64($"id").as("k"), $"id")
    // might_contain requires a constant bloom: build once, ship as a
    // literal (the sketch is ~kB — designed to be collected and broadcast)
    val bf = keys.agg(bloomAgg($"k", 2000L, 20000L)).collect().head.getAs[Array[Byte]](0)
    assert(keys.filter(!bloomMightContain(lit(bf), $"k")).count() == 0)
    val fpr = keys.select(avg(
        when(bloomMightContain(lit(bf), xxhash64($"id" + 10000000L)), 1.0)
          .otherwise(0.0)))
      .collect().head.getDouble(0)
    assert(fpr < 0.03, s"false-positive rate $fpr over design point") // 10 bits/key ≈ 1%
  }

  test("kll_agg / kll_merge_agg / kll_quantile: rank error within bound, union ≡ one-shot") {
    GraftFunctions.register(spark)
    // 100k uniform values over 7 partitions — partial sketches merge
    val df = spark.range(0, 100000).repartition(7)
      .select(($"id" % 10).as("g"), $"id".cast("double").as("v"))
    val oneShot = df.agg(kllQuantile(kllAgg($"v"), 0.5).as("q"))
      .collect().head.getDouble(0)
    // true median rank of the estimate must be within the k=200 bound (±3%)
    assert(math.abs(oneShot / 100000.0 - 0.5) < 0.03, s"median est $oneShot")
    // storage-side union: per-group sketches merged ≡ same error contract
    val viaUnion = df.groupBy($"g").agg(kllAgg($"v").as("sk"))
      .agg(kllQuantile(kllMergeAgg($"sk"), 0.9).as("q"))
      .collect().head.getDouble(0)
    assert(math.abs(viaUnion / 100000.0 - 0.9) < 0.03, s"p90-via-union $viaUnion")
    // estimates are exact data values, not interpolations
    assert(oneShot == math.floor(oneShot) && viaUnion == math.floor(viaUnion))
    // wrong-typed input fails at ANALYSIS (checkInputDataTypes), not as a
    // task-side ClassCastException after the scan ran
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(5).agg(kllAgg($"id")).collect() // long, requires double
    }
    // the SQL surface accepts a plain decimal literal rank (0.5 parses as
    // Decimal, not Double)
    spark.range(0, 101).select($"id".cast("double").as("v"))
      .createOrReplaceTempView("kll_in")
    val viaSql = spark.sql("SELECT kll_quantile(kll_agg(v), 0.5) AS q FROM kll_in")
      .collect().head.getDouble(0)
    assert(viaSql >= 40.0 && viaSql <= 60.0)
  }

  test("freq_agg: no-false-negative + bracketing guarantees under purge and merge") {
    GraftFunctions.register(spark)
    // 64 background terms × 100 + 2 hot terms × 5000, map size 16 → purges
    val background = spark.range(0, 6400)
      .select(concat(lit("bg_"), $"id" % 64).as("term"))
    val hot = spark.range(0, 10000)
      .select(concat(lit("hot_"), $"id" % 2).as("term"))
    val stream = background.unionAll(hot).repartition(5)
    val sk = stream.agg(freqAgg($"term", 16).as("sk"))
      .select(freqItems($"sk").as("items"), freqMaxError($"sk").as("maxerr"))
      .collect().head
    val maxErr = sk.getLong(1)
    val items = sk.getSeq[Row](0).map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // true counts: hot_0/hot_1 = 5000 each > maxErr → must be reported
    assert(maxErr > 0, "map smaller than vocab must purge")
    assert(maxErr < 5000, s"hot terms must exceed the error bound, got $maxErr")
    assert(items.contains("hot_0") && items.contains("hot_1"))
    // every reported estimate brackets the true count
    items.foreach { case (t, (est, lb, ub)) =>
      val truth = if (t.startsWith("hot_")) 5000L else 100L
      assert(lb <= truth && truth <= ub, s"$t: [$lb,$ub] vs $truth")
      assert(est >= lb && est <= ub)
    }
    assert(items.size <= 16, "report must respect the state bound")
  }

  test("freq_agg: error bound survives serialization when the counter map purges empty") {
    GraftFunctions.register(spark)
    // vocab (1500) >> map (32): the uniform stream purges the counter map
    // down to empty, a state whose RAW DataSketches image drops the error
    // offset entirely — the FreqSerde envelope must preserve it across
    // the partial/final serialization boundaries
    val me = spark.range(0, 20000).repartition(4)
      .select(concat(lit("t"), $"id" % 1500).as("term"))
      .agg(freqAgg($"term", 32).as("sk"))
      .select(freqMaxError($"sk")).collect().head.getLong(0)
    assert(me > 0, "lost-offset envelope must preserve the error bound")
    assert(me >= 20000 / 40, s"bound $me implausibly small for 20k uniform rows")
    // and a uniform stream legitimately reports NO heavy hitters
    val items = spark.range(0, 20000).repartition(4)
      .select(concat(lit("t"), $"id" % 1500).as("term"))
      .agg(freqAgg($"term", 32).as("sk"))
      .select(freqItems($"sk")).collect().head.getSeq[Row](0)
    assert(items.isEmpty)
  }

  test("theta_agg / theta_setop: full set algebra, exact below nominal, bounded above") {
    GraftFunctions.register(spark)
    // A = [0,150), B = [100,250): overlap 50. Below 2^12 nominal entries
    // the sketch is exact, so the set algebra returns true counts
    val a = spark.range(0, 150).repartition(3).agg(thetaAgg($"id", 12).as("ska"))
    val b = spark.range(100, 250).agg(thetaAgg($"id", 12).as("skb"))
    val r = a.crossJoin(b).select(
        thetaSetOp($"ska", $"skb", "union").as("u"),
        thetaSetOp($"ska", $"skb", "intersect").as("i"),
        thetaSetOp($"ska", $"skb", "anotb").as("x"))
      .collect().head
    assert(r.getStruct(0).getDouble(0) == 250.0)
    assert(r.getStruct(1).getDouble(0) == 50.0)
    assert(r.getStruct(2).getDouble(0) == 100.0)
    // exact mode: bounds collapse onto the estimate
    assert(r.getStruct(1).getDouble(1) == 50.0 && r.getStruct(1).getDouble(2) == 50.0)
    // estimation mode: 50k distinct through lgK=8 (256 entries) \u2014 the true
    // count sits inside the 3\u03c3 bounds and the estimate lands near it
    val big = spark.range(0, 50000).repartition(5).agg(thetaAgg($"id", 8).as("ska"))
    val s = big.select(thetaSetOp($"ska", $"ska", "union").as("u"))
      .collect().head.getStruct(0)
    assert(s.getDouble(1) <= 50000.0 && 50000.0 <= s.getDouble(2),
      s"bounds [${s.getDouble(1)}, ${s.getDouble(2)}] must bracket 50000")
    assert(math.abs(s.getDouble(0) / 50000.0 - 1.0) < 0.25)
  }

  test("normalize_text / strip_accents: composed \u2261 decomposed under NFC, accents fold") {
    GraftFunctions.register(spark)
    val composed = "caf\u00e9"        // 4 code points
    val decomposed = "cafe\u0301"     // cafe + combining acute, 5 code points
    val df = Seq(("c", composed), ("d", decomposed),
        ("sz", "stra\u00dfe"), ("nv", "na\u00efve"))
      .toDF("k", "s").repartition(2) // force the distributed (codegen) path
    val rows = df.select($"k",
        normalizeText($"s", "NFC").as("nfc"),
        normalizeText($"s", "NFD").as("nfd"),
        stripAccents($"s").as("st"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    // the two encodings converge under each normalization form
    assert(rows("c")._1 == composed && rows("d")._1 == composed)
    assert(rows("c")._2 == decomposed && rows("d")._2 == decomposed)
    // accent folding; \u00df is a letter, not a combining mark \u2014 it survives
    assert(rows("c")._3 == "cafe" && rows("d")._3 == "cafe")
    assert(rows("nv")._3 == "naive")
    assert(rows("sz")._3 == "stra\u00dfe")
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(stripAccents($"s")).collect().head
    assert(n.isNullAt(0))
  }

  test("firstValue/lastValue default to ignoreNulls=true (basic.scala:38-108)") {
    val df = Seq((1, None), (2, Some("x")), (3, Some("y")), (4, None))
      .toDF("ord", "v").coalesce(1).orderBy("ord")
    val r = df.agg(firstValue($"v"), lastValue($"v")).collect().head
    assert(r.getString(0) == "x" && r.getString(1) == "y")
  }

  test("concatSkipNulls skips nulls (stringExpressions.scala:17-18)") {
    val df = Seq(("a", null: String, "c")).toDF("x", "y", "z")
    assert(df.select(concatSkipNulls($"x", $"y", $"z")).collect().head.getString(0) == "ac")
  }

  test("rlikeFull is a full match, not substring find (stringExpressions.scala:24-37)") {
    val df = Seq("MEDIUM", "MEDIUM PLUS", "XMEDIUM").toDF("s")
    val got = df.filter(rlikeFull($"s", "MEDIUM")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("MEDIUM"))
    // plain rlike would match all three
    assert(df.filter($"s".rlike("MEDIUM")).count() == 3)
  }

  test("intDiv is integral division (arithmetics.scala:58-70)") {
    val df = Seq((7L, 2L), (-7L, 2L)).toDF("a", "b")
    val got = df.select(intDiv($"a", $"b")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, -3L))
  }

  test("arrayAggWithNulls keeps nulls unlike collect_list (basic.scala:110-126)") {
    val df = Seq(Some(1), None, Some(3)).toDF("v").coalesce(1)
    val r = df.agg(
      arrayAggWithNulls($"v").as("with_nulls"),
      collect_list($"v").as("no_nulls")).collect().head
    assert(r.getSeq[Any](0).size == 3 && r.getSeq[Any](0).contains(null))
    assert(r.getSeq[Any](1).size == 2)
  }

  test("functions usable from SQL after register()") {
    val got = spark.sql(
      "SELECT product(v) FROM VALUES (2.0), (4.0) AS t(v)").collect().head.getDouble(0)
    assert(got == 8.0)
  }

  test("lshParams: S-curve solver picks the steepest feasible banding") {
    import graft.operators.Dedup.{lshParams, lshRecallAt}
    // curve math: closed form, endpoints, monotonicity in j
    assert(math.abs(lshRecallAt(1, 1, 0.3) - 0.3) < 1e-15)
    assert(math.abs(lshRecallAt(32, 4, 0.8) -
      (1 - math.pow(1 - math.pow(0.8, 4), 32))) == 0.0)
    val curve = (1 to 9).map(i => lshRecallAt(16, 8, i / 10.0))
    assert(curve == curve.sorted, "S-curve must be monotone in j")
    // the production tuning: 128 hashes, J=0.8, near-certainty floor
    // (exact-oracle gates) solves to the steeper of the feasible set
    assert(lshParams(128, 0.8, 1 - 1e-7) == ((32, 4)))
    // r=8 clears a 0.9 floor at J=0.8 (recall 0.947) and is preferred
    // to r=4 there — fewer candidates when near-certainty isn't needed
    assert(lshParams(128, 0.8, 0.9) == ((16, 8)))
    // high threshold lets much steeper curves through
    assert(lshParams(128, 0.95, 0.99)._2 > 4)
    // infeasible floor fails loudly, not silently
    val e = intercept[IllegalArgumentException] {
      lshParams(4, 0.05, 0.9999)
    }
    assert(e.getMessage.contains("add hashes"), e.getMessage)
    // the solution is always an exact factorization
    val (b, r) = lshParams(96, 0.7, 0.99)
    assert(b * r == 96 && lshRecallAt(b, r, 0.7) >= 0.99)
  }

  test("dot_i64: codegen kernel equals the HOF fold, handles signs/null") {
    import graft.functions.GraftFunctions.dotI64
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),       // mixed signs: 4-10-18
      (Seq(0L, 0L), Seq(7L, 9L))                   // zeros
    ).toDF("a", "b")
    val got = df.select(dotI64(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-24L, 0L), got.toString)
    // equals the interpreted HOF formulation
    val hof = df
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, e) => acc + e)).collect().map(_.getLong(0)).toSeq
    assert(got == hof, hof.toString)
    // null input → null out, not a crash
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(dotI64(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
    // null ELEMENT contributes 0 (the documented contract on the
    // expression — getLong reads a zeroed slot in both representations):
    // 1·3 + 0·4 + 2·5 = 13
    val ne = spark.sql(
      "SELECT dot_i64(array(1L, CAST(NULL AS BIGINT), 2L), array(3L, 4L, 5L))")
      .collect()(0).getLong(0)
    assert(ne == 13L, ne.toString)
  }

  test("vector kernels raise on ragged inputs — never min-truncate") {
    // a corrupt or schema-drifted embedding column (one 48-wide row among
    // 64-wide) must fail loudly in every kernel of the family, not yield
    // plausible-but-wrong scores (r15 verdict finding #2)
    graft.functions.GraftFunctions.register(spark)
    def raggedMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && !c.getMessage.contains("ragged")) c = c.getCause
      c.getMessage
    }
    for (fn <- Seq(
        "dot_f32(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))",
        "cosine_f32(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))",
        "dot_i8(array(CAST(1 AS TINYINT)), array(CAST(1 AS TINYINT), CAST(2 AS TINYINT)))",
        "dot_i64(array(1L), array(1L, 2L))")) {
      val e = intercept[Throwable] { spark.sql(s"SELECT $fn").collect() }
      assert(raggedMsg(e).contains("ragged vector inputs"),
        s"$fn: ${raggedMsg(e)}")
    }
    // the reference-object codebook kernels guard too: a 2-wide codebook
    // against a 3-wide row raises through assignCells
    import spark.implicits._
    val emb = Seq((0L, Array(1.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Throwable] {
      graft.operators.Similarity.assignCells(
        emb, "embedding", Seq((0L, Array(1.0f, 0.0f)))).collect()
    }
    assert(raggedMsg(e).contains("ragged vector inputs"), raggedMsg(e))
    // equal-length inputs still flow (no false positives on the hot path)
    val ok = spark.sql(
      "SELECT dot_f32(array(CAST(3.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .collect()(0).getDouble(0)
    assert(ok == 6.0)
  }
}
