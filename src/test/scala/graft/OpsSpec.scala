package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, OpsQueries, Similarity}

/** Training-data ops without a SQL oracle: verified against brute-force
  * / planted ground truth here instead (SURVEY.md §5.2 item 5). */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8, "graft-ops-test")
  val sf = "/root/testdata/sf0.001"

  private def docsWithNearDups = {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text")))
  }

  test("minhash LSH finds every planted near-dup pair (vs exact jaccard)") {
    val exact = Dedup.ngramJaccardPairs(docsWithNearDups, "doc_id", "text", 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).select("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(planted.subsetOf(exact), "exact jaccard must find all planted copies")
    val lsh = Dedup.minhashPairs(docsWithNearDups, "doc_id", "text", 64, 16, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(lsh.contains).toDouble / planted.size
    assert(recall >= 0.95, s"minhash recall $recall over ${planted.size} planted pairs")
    // est jaccard within 0.2 of exact for planted pairs
    val est = Dedup.minhashPairs(docsWithNearDups, "doc_id", "text", 64, 16, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    planted.filter(est.contains).foreach { p =>
      assert(est(p) > 0.6, s"planted pair $p est=${est(p)}")
    }
  }

  test("simhash: planted near-dups land within hamming 3 (long docs)") {
    val pairs = Dedup.simhashPairs(docsWithNearDups, "doc_id", "text",
        maxHamming = 7, chunks = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a 3-token edit is a LARGE relative change for a 10-word doc —
    // simhash's contract is token-weight stability, meaningful on
    // substantial documents; score recall where the op should hold.
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0 && col("n_chars") >= 250).select("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(planted.nonEmpty)
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.9, s"simhash recall $recall over ${planted.size} long-doc pairs (hamming<=7)")
  }

  test("ANN LSH: finds the true near neighbor of perturbed queries") {
    // The ANN contract: retrieve GENUINELY similar vectors. Uniform
    // random data has no similar pairs (max cosine ≈0.5 — measured),
    // so queries are perturbed corpus vectors: cosine(q, orig) ≈0.999,
    // the realistic embedding-near-dup retrieval case.
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = corpus.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = base.map { case (id, v) =>
      val r = new java.util.Random(id * 7919L)
      (id + 10000L, v.map(x => x + (r.nextFloat() - 0.5f) * 0.02f))
    }.toSeq.toDF("vec_id", "embedding")
    def hits(df: org.apache.spark.sql.DataFrame): Double = {
      val top1 = df.filter(col("rank") === 1)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      base.count { case (id, _) => top1.get(id + 10000L).contains(id) }.toDouble / base.length
    }
    val bf = hits(Similarity.bruteForceTopK(corpus, queries, 10))
    assert(bf == 1.0, s"brute force must always find the perturbed original (got $bf)")
    val ann = hits(Similarity.lshTopK(corpus, queries, 10, planes = 8))
    assert(ann >= 0.8, s"ANN top-1 recall $ann (multi-probe, 8 planes)")
  }

  test("IVF ANN: finds the true near neighbor of perturbed queries") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = corpus.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = base.map { case (id, v) =>
      val r = new java.util.Random(id * 104729L)
      (id + 10000L, v.map(x => x + (r.nextFloat() - 0.5f) * 0.02f))
    }.toSeq.toDF("vec_id", "embedding")
    val centroids = graft.ops.IvfIndex.train(corpus, k = 16, iters = 2)
    val top1 = graft.ops.IvfIndex.topK(corpus, queries, centroids, k = 5, nprobe = 4)
      .filter(col("rank") === 1).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val recall = base.count { case (id, _) => top1.get(id + 10000L).contains(id) }
      .toDouble / base.length
    assert(recall >= 0.9, s"IVF top-1 recall $recall (k=16, nprobe=4)")
  }

  test("repetition filter flags repetitive docs, passes normal ones") {
    import spark.implicits._
    GraftSession.register(spark)
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence with many different words appearing once each time")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("rep_docs")
    val sh = graft.ops.Dedup.shingles(col("text"))
    val r = docs.select(col("doc_id"), sh.as("s")).collect()
      .map(x => x.getLong(0) -> x.getSeq[String](1).length).toMap
    assert(r(1L) == 1, "all-identical trigrams collapse to one distinct shingle")
    assert(r(2L) > 8, "varied text keeps its distinct trigrams")
  }

  test("langid heuristic recovers planted page languages") {
    val out = OpsQueries.all("t1_langid")(spark, sf).collect()
    val acc = out.count(r => r.getString(1) == r.getString(2)).toDouble / out.length
    assert(acc >= 0.95, s"langid accuracy $acc on ${out.length} pages")
  }

  test("graft_shingles expression == built-in reference formulation") {
    GraftSession.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val both = docs.select(
      Dedup.shingles(col("text")).as("fast"),
      Dedup.shinglesBuiltin(col("text")).as("ref")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "shingle sets diverged")
    }
  }

  test("fingerprint: deterministic, edit-robust, discriminative") {
    GraftSession.register(spark)
    val df = spark.sql(
      """SELECT graft_fingerprint('the quick brown fox jumps over the lazy dog repeatedly') AS a,
        |       graft_fingerprint('the quick brown fox jumps over the lazy dog repeatedly') AS b,
        |       graft_fingerprint('completely different content with other words entirely here') AS c
        |""".stripMargin).collect()(0)
    val a = df.getSeq[Long](0); val b = df.getSeq[Long](1); val c = df.getSeq[Long](2)
    assert(a == b, "identical text → identical fingerprint")
    assert(a.toSet.intersect(c.toSet).isEmpty, "unrelated text → disjoint fingerprints")
  }

  test("graft_topk aggregate == window ranking (ties, partials, merge)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    GraftSession.register(spark)
    // deterministic synthetic scores with deliberate TIES across
    // partitions: the bounded heap's (score desc, id asc) order must
    // reproduce the window formulation exactly
    val df = spark.range(0, 5000, 1, 16).select(
      (col("id") % 7).as("query_id"),
      col("id").as("cand_id"),
      ((col("id") * 37 % 101).cast("double") / 100.0).as("score"))
    val viaAgg = Similarity.rankTopK(df, col("query_id"), col("cand_id"), col("score"), 10)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("cand_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("graft_topk: NaN scores are dropped, not ranked inconsistently") {
    import org.apache.spark.sql.expressions.Window
    GraftSession.register(spark)
    // every 5th candidate gets a NaN score (a zero-norm embedding's
    // cosine); rankTopK must drop them — the window desc sort would
    // rank NaN FIRST while the heap would never admit/evict them
    val df = spark.range(0, 500, 1, 8).select(
      (col("id") % 3).as("query_id"),
      col("id").as("cand_id"),
      when(col("id") % 5 === 0, lit(Double.NaN))
        .otherwise((col("id") * 37 % 101).cast("double") / 100.0).as("score"))
    val viaAgg = Similarity.rankTopK(df, col("query_id"), col("cand_id"), col("score"), 10)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val clean = df.filter(!isnan(col("score")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("cand_id"))
    val viaWindow = clean.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
    // no NaN-scored candidate survives
    assert(viaAgg.forall { case (_, _, id) => id % 5 != 0 })
  }

  test("literal-arg validation: clear errors, analysis-time coercion") {
    import spark.implicits._
    GraftSession.register(spark)
    val df = Seq((1L, 2L)).toDF("a", "b")
    // non-literal k → clear IllegalArgumentException, not an NPE
    val e1 = intercept[Exception] {
      df.select(call_function("graft_topk", col("a").cast("double"), col("b"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("must be a literal"), e1.getMessage)
    // float score / int id coerce at analysis (Cast wrap) — no task crash
    val ok = spark.range(0, 10).select(lit(1L).as("q"),
        col("id").cast("int").as("cid"), (col("id") % 3).cast("float").as("s"))
    val out = Similarity.rankTopK(ok, col("q"), col("cid"), col("s"), 3).collect()
    assert(out.length == 3)
    // unknown engine string → analysis error, never silent Default
    val e2 = intercept[Exception] {
      spark.range(1).select(call_function("graft_extract",
        lit("x".getBytes("UTF-8")), lit("en"), lit("tesseract"))).collect()
    }
    assert(e2.getMessage.contains("unknown graft engine"), e2.getMessage)
    // graft_mix64 / graft_nfc coerce at analysis like graft_topk
    // (ADVICE r3): an INT column casts cleanly to the declared input
    // type instead of ClassCastException-ing inside a task
    val mixed = spark.range(0, 3)
      .select(call_function("graft_mix64", col("id").cast("int")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(mixed == (0L until 3L).map(graft.expr.Hash64.mix))
    val nfc = spark.range(0, 2)
      .select(call_function("graft_nfc", col("id").cast("int")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(nfc == Seq("0", "1"))
  }

  test("multimodal: real image+audio+video decode, frame sampling") {
    val feats = Multimodal.features(Multimodal.gen(spark, 300))
    val rows = feats.collect()
    assert(rows.length == 300)
    // gen plants a corrupted payload every 50th+7 row (error-as-row
    // path, DuckDB-oracled in m1); everything else decodes cleanly
    val (bad50, good) = rows.partition(_.media_id % 50 == 7)
    assert(bad50.nonEmpty && bad50.forall(r => r.decode_error == (r.kind match {
      case "image" => "bad image"
      case "audio" => "bad audio"
      case _       => "bad video"
    })))
    assert(bad50.exists(_.kind == "image"), "planted errors must hit the image path too")
    assert(bad50.exists(_.kind == "audio"), "planted errors must hit the audio path too")
    assert(bad50.exists(_.kind == "video"), "planted errors must hit the video path too")
    assert(good.forall(_.decode_error == null))
    assert(good.forall(r => r.width >= 8 && r.height >= 8 && r.feature.length == 8))
    // image metadata comes from REAL imageio decode of real PNG pixels;
    // the feature is the full pixel histogram (sums to w*h)
    val images = good.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { r =>
      assert(r.width == (16 + (r.media_id * 37) % 512).toInt, s"id=${r.media_id}")
      assert(r.feature.sum == r.width.toFloat * r.height, s"id=${r.media_id}")
    }
    // both JDK codecs must actually run (gen alternates PNG and JPEG)
    assert(images.exists(r => (r.media_id / 3) % 2 == 0), "png rows present")
    assert(images.exists(r => (r.media_id / 3) % 2 == 1), "jpeg rows present")
    // audio metadata comes from REAL javax.sound decode of real WAVs:
    // width = decoded frame count, height = decoded sample rate, and
    // the amplitude histogram has one count per decoded sample
    val audios = good.filter(_.kind == "audio")
    assert(audios.nonEmpty)
    audios.foreach { r =>
      assert(r.width == (16 + (r.media_id * 37) % 512).toInt, s"id=${r.media_id}")
      assert(r.height == (16 + (r.media_id * 73) % 512).toInt, s"id=${r.media_id}")
      assert(r.n_frames == 1 && r.feature.sum == r.width.toFloat, s"id=${r.media_id}")
    }
    // video metadata comes from REAL MJPEG decode: width/height are
    // the decoded first frame's dimensions, n_frames is the counted
    // '00dc' chunks, and the histogram counts every decoded pixel of
    // EVERY frame — feature.sum == n_frames·w·h proves all frames ran
    // through imageio, not just the header parse
    val videos = good.filter(_.kind == "video")
    assert(videos.nonEmpty)
    videos.foreach { r =>
      assert(r.width == (8 + (r.media_id * 37) % 24).toInt, s"id=${r.media_id}")
      assert(r.height == (8 + (r.media_id * 73) % 24).toInt, s"id=${r.media_id}")
      assert(r.n_frames == (1 + (r.media_id * 91) % 240).toInt, s"id=${r.media_id}")
      assert(r.feature.sum == r.n_frames.toFloat * r.width * r.height,
        s"id=${r.media_id}: every frame's pixels must be decoded")
    }
    val frames = Multimodal.frameSample(feats.toDF(), 24).collect()
    assert(frames.nonEmpty)
    val expected = videos.map(v => (v.n_frames + 23) / 24).sum
    assert(frames.length == expected, s"frame count ${frames.length} vs $expected")
    // corrupted payload → error row, not task failure
    import spark.implicits._
    val bad = Multimodal.features(Seq(
      Multimodal.MediaRow(99L, "image", Array[Byte](1, 2, 3))).toDS()).collect()
    assert(bad.head.decode_error != null)
  }

  test("multimodal: decodes a non-synthetic hand-built PNG fixture") {
    import spark.implicits._
    // 3x2 RGB PNG written by hand (IHDR/IDAT/IEND, zlib-deflated
    // scanlines — NOT produced by Multimodal.makePng/imageio), pixels:
    // (255,0,0)(0,255,0)(0,0,255) / (10,20,30)(40,50,60)(200,200,200)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAGElEQVR4nGP4z8DAAMFcInIaRjYnTpwAADY9Bij3fWhVAAAAAElFTkSuQmCC")
    val out = Multimodal.features(
      Seq(Multimodal.MediaRow(1L, "image", png)).toDS()).collect().head
    assert(out.decode_error == null)
    assert(out.width == 3 && out.height == 2 && out.n_frames == 1)
    // red-channel histogram (>>5 bins) of the known pixels
    assert(out.feature.toSeq == Seq(3f, 1f, 0f, 0f, 0f, 0f, 1f, 1f))
  }

  test("connected components: hand-built graph + brute-force cross-check") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 (min label needs 5 propagation hops), a
    // triangle {10,11,12} with a pendant 13, an isolated pair {20,21},
    // and a duplicate/reversed edge — canon is the component min
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L), (20L, 21L), (21L, 20L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
    // empty pair list → empty result, no iteration
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
    // brute-force cross-check on a deterministic pseudo-random graph
    val rnd = Seq.tabulate(40) { i =>
      val a = (i * 13 + 5) % 23; val b = (i * 29 + 11) % 23
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val got = Dedup.connectedComponents(rnd.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    rnd.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    // union-find roots are already component minima (we always hang
    // the larger root under the smaller)
    assert(got == want, s"got=$got want=$want")
    // a non-converging bound fails loudly rather than silently
    val chain = Seq.tabulate(9)(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxRounds = 2)
    }
    assert(Dedup.connectedComponents(chain).collect()
      .forall(_.getLong(1) == 0L))
    // off-by-one (ADVICE r3): a component whose diameter EQUALS
    // maxRounds converges — fixpoint detection gets its own extra round
    val path2 = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b") // diameter 2
    assert(Dedup.connectedComponents(path2, maxRounds = 2).collect()
      .forall(_.getLong(1) == 0L))
    // reliable-checkpoint mode (the multi-executor deployment choice:
    // localCheckpoint blocks die with a lost executor) produces
    // identical clusters
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val gotCkpt = Dedup.connectedComponents(rnd.toDF("id_a", "id_b"),
        checkpointDir = Some(ckpt)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCkpt == want, "checkpointDir run must match localCheckpoint run")
  }

  test("outlinks: quote traps, data-href, bare values, case, order") {
    import spark.implicits._
    GraftSession.register(spark)
    def links(html: String): Seq[String] =
      Seq(html).toDF("h")
        .select(call_function("graft_outlinks", col("h")))
        .collect().head.getSeq[String](0)
    // document order, duplicates preserved, '>' inside a quoted title
    // must not end the tag, data-href must not match, anchors without
    // href are skipped, bare and uppercase forms parse
    val html =
      """<html><body>
        |<a title="a > b" href="/one">x</a>
        |<div data-href="/NOT">y</div>
        |<a href=/bare>z</a>
        |<A HREF='/two'>w</A>
        |<a name="n">no link</a>
        |<a href="/one">dup</a>
        |</body></html>""".stripMargin
    assert(links(html) == Seq("/one", "/bare", "/two", "/one"))
    // binary payloads decode utf-8 through the same function
    val bin = Seq(("<a href=\"/ب\">x</a>".getBytes("UTF-8"))).toDF("h")
      .select(call_function("graft_outlinks", col("h")))
      .collect().head.getSeq[String](0)
    assert(bin == Seq("/ب"))
    assert(links("<p>no anchors</p>") == Seq())
  }

  test("integer pagerank: sinks accumulate, determinism, driver recompute") {
    import spark.implicits._
    import graft.ops.Graph
    // a→c, b→c, c→a: c collects two contributions, and every number
    // must equal a driver-side recompute of the same fixed-point rule
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val scale = 1L << 20
    val nodes = Seq("a", "b", "c")
    val outdeg = Map("a" -> 1L, "b" -> 1L, "c" -> 1L)
    val base = (15L * scale) / (100L * 3)
    var ranks = nodes.map(_ -> scale / 3).toMap
    (1 to 3).foreach { _ =>
      val contrib = Seq(("a", "c"), ("b", "c"), ("c", "a"))
        .groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (s, _) => (85L * ranks(s)) / (100L * outdeg(s)) }.sum
        }
      ranks = nodes.map(h => h -> (base + contrib.getOrElse(h, 0L))).toMap
    }
    assert(got == ranks, s"got $got want $ranks")
    assert(got("c") > got("b"), "the doubly-linked node must rank higher")
    // rerun → identical (integer arithmetic, no float order sensitivity)
    val again = Graph.pageRank(edges, "src", "dst", iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("pagerank iters=20 + reliable checkpoints: bit-identical, caches released") {
    import spark.implicits._
    import graft.ops.Graph
    val es = Seq(("a", "c"), ("b", "c"), ("c", "a"), ("a", "b"))
    val edges = es.toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-cp").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Graph.pageRank(edges, "src", "dst", iters = 20,
        checkpointDir = Some(dir), checkpointInterval = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // VERDICT r4 #4: loop frames must not leak into session LRU —
    // with a reliable dir the checkpoints hold no block-manager RDDs,
    // so no NEW persistent RDD may survive the call (set difference,
    // not a count: the async ContextCleaner may drop OLD entries from
    // earlier tests concurrently)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"pageRank leaked persisted frames: $leaked")
    // driver recompute of 20 rounds of the same fixed-point rule
    val scale = 1L << 20
    val nodes = Seq("a", "b", "c")
    val outdeg = es.groupBy(_._1).map { case (s, l) => s -> l.size.toLong }
    val base = (15L * scale) / (100L * 3)
    var ranks = nodes.map(_ -> scale / 3).toMap
    (1 to 20).foreach { _ =>
      val contrib = es.groupBy(_._2).map { case (d, l) =>
        d -> l.map { case (s, _) => (85L * ranks(s)) / (100L * outdeg(s)) }.sum
      }
      ranks = nodes.map(h => h -> (base + contrib.getOrElse(h, 0L))).toMap
    }
    assert(got == ranks, s"got $got want $ranks")
  }

  test("g5 HITS: bit-exact vs driver recompute; deep iters release caches") {
    import spark.implicits._
    import graft.ops.Graph
    // varied degrees: a is a strong hub, c a strong authority
    val es = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("c", "a"), ("e", "c"))
    val edges = es.toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iters = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scale = 1L << 20
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = nodes.map(_ -> scale).toMap
    (1 to 2).foreach { _ =>
      val araw = nodes.map(v =>
        v -> es.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      val amax = araw.values.max
      auth = araw.map { case (k, s) => k -> (s * scale) / amax }
      val hraw = nodes.map(u =>
        u -> es.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
      val hmax = hraw.values.max
      hub = hraw.map { case (k, s) => k -> (s * scale) / hmax }
    }
    nodes.foreach { v => assert(got(v) == (hub(v), auth(v)), s"node $v") }
    // the max node of each score lands exactly on scale; ranks differ
    assert(got.values.map(_._1).max == scale && got.values.map(_._2).max == scale)
    assert(got.values.toSet.size > 1)
    // deep run with a reliable checkpoint dir: cadence path + no leaks
    val dir = java.nio.file.Files.createTempDirectory("graft-hits-cp").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val deep = Graph.hits(edges, "src", "dst", iters = 7,
      checkpointDir = Some(dir), checkpointInterval = 3)
    assert(deep.count() == nodes.size.toLong)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"hits leaked persisted frames: $leaked")
  }

  test("pagerank dangling redistribution: integer-exact, recompute-mirrored") {
    import spark.implicits._
    import graft.ops.Graph
    // d is dangling (receives from c, emits nothing): with the flag
    // its mass recirculates as one floored global term per round
    val es = Seq(("a", "c"), ("b", "c"), ("c", "d"))
    val edges = es.toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 4,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val scale = 1L << 20
    val nodes = Seq("a", "b", "c", "d")
    val outdeg = es.groupBy(_._1).map { case (s, l) => s -> l.size.toLong }
    val base = (15L * scale) / (100L * 4)
    var ranks = nodes.map(_ -> scale / 4).toMap
    (1 to 4).foreach { _ =>
      val contrib = es.groupBy(_._2).map { case (d, l) =>
        d -> l.map { case (s, _) => (85L * ranks(s)) / (100L * outdeg(s)) }.sum
      }
      // the documented rule: D from ranks ENTERING the round, one
      // floored division on the global sum, remainder dropped
      val dMass = ranks("d")
      val add = (85L * dMass) / (100L * 4)
      ranks = nodes.map(h => h -> (base + contrib.getOrElse(h, 0L) + add)).toMap
    }
    assert(got == ranks, s"got $got want $ranks")
    val noRedist = Graph.pageRank(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noRedist.values.sum < got.values.sum,
      "redistribution must conserve more total mass than the leaky default")
  }

  test("paragraph dedup: banner killed corpus-wide, uniques survive, dup doc empties") {
    import spark.implicits._
    GraftSession.register(spark)
    val docs = Seq(
      (0L, "alpha body\nShared Banner"),
      (1L, "beta body\nShared Banner"),
      (2L, "alpha body\nShared Banner"), // exact dup of doc 0's paragraphs
      (3L, "gamma\nunique three")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.paragraphDedup(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_dedup")))).toMap
    assert(got(0L) == ((2L, 2L, "alpha body\nShared Banner")),
      "first occurrences all survive")
    assert(got(1L) == ((2L, 1L, "beta body")), "banner dies on its second doc")
    assert(got(2L) == ((2L, 0L, "")), "a fully-duplicated doc loses everything")
    assert(got(3L) == ((2L, 2L, "gamma\nunique three")))
    // expression ↔ oracle hash parity: graft_fnv64 IS Hash64.fnv1a
    val h = docs.select(org.apache.spark.sql.functions.call_function(
      "graft_fnv64", org.apache.spark.sql.functions.lit("Shared Banner")))
      .head().getLong(0)
    assert(h == graft.expr.Hash64.fnv1a("Shared Banner"))
  }

  test("paragraph dedup identity: a globally-unique corpus passes through untouched") {
    import spark.implicits._
    GraftSession.register(spark)
    val docs = (0L until 50L).map { i =>
      (i, s"alpha $i\nbeta $i\ngamma $i")
    }.toDF("doc_id", "text")
    val got = graft.ops.Dedup.paragraphDedup(docs, "doc_id", "text").collect()
    assert(got.length == 50)
    got.foreach { r =>
      assert(r.getAs[Long]("n_paras") == 3L && r.getAs[Long]("n_kept") == 3L)
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("text_dedup") == s"alpha $id\nbeta $id\ngamma $id",
        "reassembly must preserve order and content byte-for-byte")
    }
  }

  test("deduped corpus: exactly the canonical + untouched docs survive") {
    val d6 = OpsQueries.all("d6_dup_clusters")(spark, sf).collect()
    val losers = d6.filter(r => r.getAs[Long]("canon_id") != r.getAs[Long]("doc_id"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(losers.nonEmpty)
    val kept = OpsQueries.all("d9_dedup_corpus")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val all = (base ++ base.filter(_ % 5 == 0).map(_ + 100000L)).toSet
    assert(kept == all -- losers,
      s"missing=${(all -- losers -- kept).take(5)} extra=${(kept -- all).take(5)}")
  }

  test("pii redaction: planted emails/ips/phones are counted and scrubbed") {
    val out = OpsQueries.all("t6_redact")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val red = r.getAs[String]("redacted")
      id % 4 match {
        case 0 =>
          assert(r.getAs[Int]("n_emails") >= 1 && red.contains("<EMAIL>"), s"id=$id")
          assert(!red.contains(s"user$id@example.com"), s"id=$id")
        case 1 =>
          assert(r.getAs[Int]("n_ips") >= 1 && red.contains("<IP>"), s"id=$id")
        case 2 =>
          assert(r.getAs[Int]("n_phones") >= 1 && red.contains("<PHONE>"), s"id=$id")
        case _ => ()
      }
      // nothing PII-shaped survives redaction
      assert(!red.matches("(?s).*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"), s"id=$id")
      assert(!red.matches("(?s).*\\+[0-9]{7,15}.*"), s"id=$id")
    }
  }

  test("decontamination: planted eval-overlap docs flagged, clean corpus not") {
    val out = OpsQueries.all("d7_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty)
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_overlap"), r.getAs[Boolean]("contaminated"))).toMap
    // every planted row (an eval doc re-appearing padded) must be caught
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 13 === 0).select("doc_id").collect()
      .map(_.getLong(0) + 200000)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(byId.contains(id) && byId(id)._2, s"planted contaminated doc $id not flagged")
      assert(byId(id)._1 >= 8, s"doc $id overlap ${byId(id)}")
    }
    // flagged rows are overwhelmingly the planted ones (natural trigram
    // collisions between unrelated docs stay below the threshold)
    val flagged = byId.count(_._2._2)
    assert(flagged >= planted.length && flagged <= planted.length * 2,
      s"flagged=$flagged planted=${planted.length}")
  }

  test("exact-substring dedup: spliced copies flagged, window hashes == fnv1a") {
    import spark.implicits._
    GraftSession.register(spark)
    // expression vs first-principles: hash of each positional 8-token
    // window must equal Hash64.fnv1a of the space-joined window string
    val txt = "  a bb\tccc dd e ff g hh ii jj "
    val hashes = Seq(txt).toDF("text")
      .select(call_function("graft_token_windows", col("text"), lit(8)).as("w"))
      .collect().head.getSeq[Long](0)
    val toks = txt.trim.split("\\s+").toSeq
    val want = (0 to toks.length - 8)
      .map(j => graft.expr.Hash64.fnv1a(toks.slice(j, j + 8).mkString(" ")))
    assert(hashes == want)
    // fewer than k tokens → empty, not an error
    assert(Seq("one two three").toDF("text")
      .select(call_function("graft_token_windows", col("text"), lit(8)))
      .collect().head.getSeq[Long](0).isEmpty)
    // property: for random token lists and window sizes, the virtual-
    // string hash equals fnv1a of the materialized joined window
    val rnd = new scala.util.Random(4242)
    (1 to 40).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val n = rnd.nextInt(14)
      val words = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString)
      val text = words.mkString(sep = if (rnd.nextBoolean()) " " else "\t  ")
      val got = Seq(text).toDF("text")
        .select(call_function("graft_token_windows", col("text"), lit(k)))
        .collect().head.getSeq[Long](0)
      val exp = (0 to n - k)
        .map(j => graft.expr.Hash64.fnv1a(words.slice(j, j + k).mkString(" ")))
      assert(got == exp, s"k=$k words=$words")
    }
    // d8: every planted spliced copy (doc_id ≥ 300000) shares nearly
    // all its post-prefix windows with the original — flagged high;
    // its original stays the canonical first occurrence
    val out = OpsQueries.all("d8_substring_dup")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Double]("dup_ratio"))).toMap
    val copies = out.keys.filter(_ >= 300000L).toSeq
    assert(copies.nonEmpty)
    copies.foreach { id =>
      val (nw, nd, ratio) = out(id)
      assert(nd >= 1 && ratio >= 0.3, s"copy $id: ($nw, $nd, $ratio)")
      // the windows fully inside the splice are EXACTLY the original's
      // window count (prefix = 7 tokens ⇒ 7 boundary windows are new)
      val (onw, _, _) = out(id - 300000L)
      assert(nd >= onw, s"copy $id must duplicate all ${onw} original windows")
    }
    // originals are mostly clean; the exceptions are the corpus's own
    // repetitive docs (self-duplicating windows), not the splices
    val orig = out.filter(_._1 < 300000L).values.map(_._3)
    assert(orig.sum / orig.size < 0.2, "bulk of the corpus must be unflagged")
  }

  test("decontamination guard: oversized eval set falls back off the broadcast") {
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 13 === 0)
    val corpus = docs.filter(col("doc_id") % 13 =!= 0)
    def planOf(maxSh: Long): (String, Array[(Long, Long)]) = {
      val df = Dedup.decontaminate(corpus, evalSet, "doc_id", "text",
        minOverlap = 8, maxEvalShingles = maxSh)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap"))
          .sortBy(_._1))
    }
    // below the bound: eval side broadcasts (the 100 TB shape)
    val (pBcast, rBcast) = planOf(Long.MaxValue)
    assert(pBcast.contains("BroadcastHashJoin"), pBcast.take(600))
    // an eval set larger than the bound must NOT be broadcast — the
    // guard trips to a shuffle equi-join with identical results
    val (pShuffle, rShuffle) = planOf(1L)
    assert(!pShuffle.contains("BroadcastHashJoin"), pShuffle.take(600))
    assert(rBcast.sameElements(rShuffle), "guard must not change results")
  }

  test("decontamination bloom band: map-side pre-filter, provably exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evalSet = docs.filter(col("doc_id") % 13 === 0)
    val corpus = docs.filter(col("doc_id") % 13 =!= 0)
    def run(maxSh: Long, maxBloom: Long): (String, Array[(Long, Long)]) = {
      val df = Dedup.decontaminate(corpus, evalSet, "doc_id", "text",
        minOverlap = 8, maxEvalShingles = maxSh, maxBloomItems = maxBloom)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap"))
          .sortBy(_._1))
    }
    // over-broadcast band: the corpus shingle stream must carry the
    // bloom probe below the exact join, and the eval side must not be
    // a driver-collected broadcast
    val (pBloom, rBloom) = run(0L, Long.MaxValue)
    assert(pBloom.contains("graft_bloom_contains"), pBloom.take(800))
    assert(!pBloom.contains("BroadcastHashJoin"), pBloom.take(800))
    // no false negatives + FPs die in the join ⇒ identical rows to the
    // broadcast path AND to the bloom-less merge-join floor
    val (_, rBcast) = run(Long.MaxValue, Long.MaxValue)
    val (pFloor, rFloor) = run(0L, 0L)
    assert(!pFloor.contains("graft_bloom_contains"),
      "beyond maxBloomItems the pre-filter must be skipped")
    assert(rBloom.sameElements(rBcast), "bloom band must not change results")
    assert(rFloor.sameElements(rBcast), "merge-join floor must not change results")
    // probe/build hash parity, directly: every inserted member answers
    // true (bloom filters cannot false-negative)
    import spark.implicits._
    val members = Seq("alpha beta gamma", "x", "عينة نصية", "").toDF("shingle")
    val bf = members.stat.bloomFilter("shingle", 4L, 0.01)
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    val probes = members.select(
      call_function("graft_bloom_contains", lit(os.toByteArray), col("shingle")))
      .collect().map(_.getBoolean(0))
    assert(probes.forall(identity), "members must always probe true")
  }

  test("incremental ingest: bloom-of-batch pre-filter exact vs brute-force classes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch =
      docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" fresh tail")).as("text")))
      .unionAll(docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 700000).as("doc_id"),
          concat(col("text"), lit(" fresh tail")).as("text")))
    def run(maxBloom: Long): (String, Array[(Long, String)]) = {
      val df = Dedup.incrementalIngest(docs, batch, "doc_id", "text",
        maxBloomItems = maxBloom)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
          .sortBy(_._1))
    }
    // bloom band present on the corpus stream; floor path identical
    val (pB, rB) = run(Long.MaxValue)
    assert(pB.contains("graft_bloom_contains"),
      s"corpus sha stream must be bloom-pre-filtered:\n${pB.take(800)}")
    val (pF, rF) = run(0L)
    assert(!pF.contains("graft_bloom_contains"),
      "beyond maxBloomItems the pre-filter must be skipped")
    assert(rB.sameElements(rF), "bloom must not change the classification")
    // brute-force driver oracle (handles corpus-internal text twins):
    // in-corpus text → corpus_dup; else min-id per text → fresh;
    // later same-text rows → batch_dup
    val corpusTexts = docs.collect().map(_.getString(1)).toSet
    val batchRows = batch.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val firstOf = batchRows.filterNot(r => corpusTexts(r._2))
      .groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    val expected = batchRows.map { case (id, t) =>
      id -> (if (corpusTexts(t)) "corpus_dup"
             else if (firstOf(t) == id) "fresh" else "batch_dup")
    }
    assert(rB.sameElements(expected))
    // every class is actually exercised by the plants
    val classes = rB.map(_._2).toSet
    assert(classes == Set("corpus_dup", "batch_dup", "fresh"), classes.toString)
  }

  test("rare-token ratio: corpus-DF-driven, exact against a driver recount") {
    val out = OpsQueries.all("t10_rare_tokens")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_rare"),
          r.getAs[Double]("rare_ratio"))).toMap
    assert(out.nonEmpty)
    // driver recount over the same corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("[ \\t\\n\\f\\r\\u000B]+").toSeq)
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length }
    docs.foreach { case (id, ts) =>
      val nRare = ts.count(t => df(t) <= 2)
      val (gotN, gotR, ratio) = out(id)
      assert(gotN == ts.length && gotR == nRare, s"doc $id")
      assert(ratio == nRare.toDouble / ts.length, s"doc $id ratio")
    }
  }

  test("t18 HLL vocabulary sketch: registers exact vs driver recompute; estimate accurate") {
    val out = OpsQueries.all("t18_host_vocab")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Int]("n_occupied"), r.getAs[Long]("reg_sum"))).toMap
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (h, rows) =>
      val regs = new Array[Int](1024)
      val exact = scala.collection.mutable.Set[String]()
      rows.foreach { case (_, text) =>
        text.trim.split("[ \\t\\n\\f\\r\\u000B]+").foreach { tk =>
          exact += tk
          val mv = graft.expr.Hash64.mix(graft.expr.Hash64.fnv1a(tk))
          val b = (mv >>> 54).toInt
          val v = mv & ((1L << 54) - 1)
          val rho =
            if (v == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(v))
          if (rho > regs(b)) regs(b) = rho
        }
      }
      val (gotOcc, gotSum) = out(h)
      assert(gotOcc == regs.count(_ > 0), s"host $h occupied")
      assert(gotSum == regs.map(_.toLong).sum, s"host $h reg sum")
      // m=1024 → ~3.25% rel. std. error (linear-counting regime is
      // tighter still); 15% is a generous determinism-free sanity bound
      val est = graft.expr.HllAgg.estimate(regs)
      val err = math.abs(est - exact.size) / exact.size
      assert(err < 0.15, s"host $h est $est exact ${exact.size} err $err")
    }
  }

  test("graft_anchors: strip / implicit-close / EOF / quote-aware rules") {
    GraftSession.register(spark)
    import spark.implicits._
    def anchors(html: String): Seq[(String, String)] =
      Seq(html).toDF("h")
        .select(explode(call_function("graft_anchors", col("h"))).as("a"))
        .select(col("a.href"), col("a.anchor"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    // nested tags stripped, whitespace runs collapsed, ends trimmed
    assert(anchors("<a href=\"/x\"> <b>bold</b>\n link </a>") ==
      Seq("/x" -> "bold link"))
    // bare href value; a new <a> implicitly closes; EOF closes
    assert(anchors("<a href=/one>first<a href='/two'>second") ==
      Seq("/one" -> "first", "/two" -> "second"))
    // '>' inside a quoted attribute does not end the tag; no-href
    // anchors are skipped entirely
    assert(anchors("<a title=\"a > b\" href=\"/q\">t</a><a name=x>skip</a>") ==
      Seq("/q" -> "t"))
    // data-href never matches (href must follow whitespace)
    assert(anchors("<a data-href=\"/no\">t</a>").isEmpty)
    // nested tag with quoted '>' inside is stripped whole
    assert(anchors("<a href=\"/z\">x <img alt=\"y>z\"> w</a>") ==
      Seq("/z" -> "x w"))
  }

  test("t19 length quantiles: histogram rule equals sorted-order percentiles") {
    val out = OpsQueries.all("t19_length_quantiles")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Int]("p50_bin"),
          r.getAs[Int]("p90_bin"))).toMap
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map { r =>
        val t = r.getString(1)
        (r.getString(0), t.codePointCount(0, t.length)) // Spark length() = code points
      }
    docs.groupBy(_._1).foreach { case (h, rows) =>
      val ls = rows.map(_._2).sorted
      val n = ls.length
      val p50 = ls((n + 1) / 2 - 1) >> 8          // the ceil(n/2)-th smallest
      val p90 = ls((9 * n + 9) / 10 - 1) >> 8     // the ceil(9n/10)-th smallest
      val (gotN, got50, got90) = out(h)
      assert(gotN == n.toLong && got50 == p50 && got90 == p90, s"host $h")
    }
  }

  test("graft_meta: first-wins / attr-order / case / bare-value rules") {
    GraftSession.register(spark)
    import spark.implicits._
    def meta(html: String) = Seq(html).toDF("h")
      .select(explode(array(call_function("graft_meta", col("h")))).as("m"))
      .select(col("m.title"), col("m.description"), col("m.canonical"),
        col("m.noindex"))
      .collect().head
    val r = meta("<head><title>A</title><title>B</title>" +
      "<meta name=description content=first>" +
      "<meta name=\"description\" content=\"second\">" +
      "<META NAME='ROBOTS' CONTENT='a,NoIndex'>" +
      "<link href=\"/c\" rel=canonical><link rel=canonical href=/d></head>")
    assert(r.getString(0) == "A" && r.getString(1) == "first" &&
      r.getString(2) == "/c" && r.getBoolean(3))
    val none = meta("<p>no head at all</p>")
    assert(none.isNullAt(0) && none.isNullAt(1) && none.isNullAt(2) &&
      !none.getBoolean(3))
    // unclosed title runs to EOF, whitespace collapsed + trimmed
    assert(meta("<title> a\n  b").getString(0) == "a b")
    // robots without noindex stays false; description-less meta ignored
    val r2 = meta("<meta name=robots content=all><meta charset=utf-8>")
    assert(!r2.getBoolean(3) && r2.isNullAt(1))
  }

  test("d13 SemDeDup: planted exact copies are dropped, originals kept") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val withDups = e.unionAll(e.filter(col("vec_id") % 9 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val out = graft.ops.Dedup.semDedup(withDups, "vec_id", "embedding",
        k = 16, iters = 2, minCosine = 0.999999).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Boolean]("kept"))).toMap
    val planted = e.filter(col("vec_id") % 9 === 0).select("vec_id")
      .collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      // identical vectors land in the identical cluster (same argmin)
      assert(out(id + 100000)._1 == out(id)._1, s"cluster split for $id")
      // the higher-id copy is dominated; the original survives it
      // (it can only be dropped by an even-lower similar neighbor,
      // which the 0.999999 threshold reserves for exact copies)
      assert(!out(id + 100000)._2, s"copy of $id not dropped")
      assert(out(id)._2, s"original $id wrongly dropped")
    }
    // every drop has a lower-id cluster-mate: the min id of each
    // cluster can never be dropped
    out.groupBy(_._2._1).foreach { case (cl, rows) =>
      val minId = rows.keys.min
      assert(rows(minId)._2, s"cluster $cl min id $minId dropped")
    }
  }

  test("t17 token-familiarity: head/tail split join equals a driver recount") {
    val out = OpsQueries.all("t17_token_lm")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("fam_bits"),
          r.getAs[Double]("familiarity"))).toMap
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("[ \\t\\n\\f\\r\\u000B]+").toSeq)
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tk, xs) => tk -> xs.length }
    // both halves of the split join must actually carry rows at this sf
    assert(df.values.exists(_ > 64), "no head (df>64) tokens — split untested")
    assert(df.values.exists(_ <= 64), "no tail (df<=64) tokens — split untested")
    docs.foreach { case (id, ts) =>
      val bits = ts.map(tk =>
        java.lang.Long.toBinaryString(df(tk).toLong).length.toLong).sum
      val (gotN, gotB, fam) = out(id)
      assert(gotN == ts.length && gotB == bits, s"doc $id")
      assert(fam == bits.toDouble / ts.length, s"doc $id familiarity")
    }
  }

  test("per-host cap: deterministic top-K sample per source == window reference") {
    import org.apache.spark.sql.expressions.Window
    val out = OpsQueries.all("t9_host_cap")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("rank")))
    assert(out.nonEmpty)
    // exactly min(K, host size) docs survive per host
    val bySource = out.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 10 && rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"$src: ${rows.length} kept, ranks ${rows.map(_._3).sorted.mkString(",")}")
    }
    // the bounded-heap result must equal the window-ranking reference
    // (same (score DESC, doc_id) order the oracle recomputes)
    GraftSession.register(spark)
    val scored = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        shiftrightunsigned(call_function("graft_mix64", col("doc_id")), 11)
          .cast("double").as("score"))
    val ref = scored.withColumn("rank",
        row_number().over(Window.partitionBy("source")
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= 10)
      .select("doc_id", "source", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("rank").toLong)).sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == ref.toSeq)
    // retry-stable: a second run is identical (rand() would not be)
    val again = OpsQueries.all("t9_host_cap")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("rank")))
    assert(again.sameElements(out))
  }

  test("deterministic split: stable across runs, ratios near 90/5/5") {
    val run1 = OpsQueries.all("t8_split")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("bucket"), r.getAs[String]("split")))
    val run2 = OpsQueries.all("t8_split")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("bucket"), r.getAs[String]("split")))
    assert(run1.nonEmpty && run1.sameElements(run2), "split must be deterministic")
    run1.foreach { case (id, (b, s)) =>
      assert(b == java.lang.Math.floorMod(graft.expr.Hash64.mix(id), 100L), s"id=$id")
      assert(s == (if (b < 90) "train" else if (b < 95) "val" else "test"))
    }
    val n = run1.length.toDouble
    val train = run1.count(_._2._2 == "train") / n
    assert(train > 0.84 && train < 0.96, s"train fraction $train")
  }

  test("nfc normalization: combining sequences compose, ascii fast path") {
    val out = OpsQueries.all("t7_nfc")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val norm = r.getAs[String]("norm")
      if (id % 3 == 0) {
        // e + U+0301 composed to precomposed é: one char shorter
        assert(r.getAs[Boolean]("changed"), s"id=$id")
        assert(norm.endsWith(" nfc:\u00e9"), s"id=$id")
        assert(r.getAs[Int]("len_after") == r.getAs[Int]("len_before") - 1, s"id=$id")
      } else if (id % 3 == 1) {
        assert(r.getAs[Boolean]("changed") && norm.endsWith(" nfc:\u00c5"), s"id=$id")
      } else {
        // already-NFC text passes through unchanged
        assert(!r.getAs[Boolean]("changed"), s"id=$id")
        assert(r.getAs[Int]("len_after") == r.getAs[Int]("len_before"), s"id=$id")
      }
    }
  }

  test("url canonicalization: case, default ports, fragments, tracking params") {
    val out = OpsQueries.all("u1_url_canon")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val canon = r.getAs[String]("canon_url")
      val host = r.getAs[String]("canon_host")
      // scheme+host lowercased, path case preserved
      assert(canon.startsWith(if (id % 3 == 0) "http://" else "https://"), canon)
      assert(host == host.toLowerCase && canon.contains(s"/a/$id"), canon)
      // default port dropped exactly when it matches the scheme
      // (:80 under http, :443 under https), :8080 always kept
      if (id % 4 == 0 && id % 3 == 0) assert(!host.endsWith(":80"), canon)
      if (id % 4 == 1 && id % 3 != 0) assert(!host.endsWith(":443"), canon)
      if (id % 4 == 0 && id % 3 != 0) assert(host.endsWith(":80"), canon) // https://…:80 is NOT default
      if (id % 4 == 2) assert(host.endsWith(":8080"), canon)
      // fragment stripped, tracking params stripped, survivors sorted
      assert(!canon.contains("#") && !canon.contains("utm_") && !canon.contains("fbclid"), canon)
      if (id % 5 == 0) {
        assert(r.getAs[Int]("n_tracking_params") == 2, canon)
        assert(canon.endsWith(s"?id=${id % 50}"), canon)
      }
      if (id % 5 == 1) assert(canon.endsWith("?a=1&b=2"), canon) // sorted, fbclid gone
      if (id % 5 > 2) assert(!canon.contains("?"), canon)
    }
  }

  test("url dedup: surface variants collapse to one keeper per logical page") {
    val out = OpsQueries.all("u2_url_dedup")(spark, sf).collect()
    assert(out.nonEmpty)
    // exactly the docs sharing doc_id % 229 share a canon_url (the
    // remaining residues drive only canonicalization-invariant noise)
    val byCanon = out.groupBy(_.getAs[String]("canon_url"))
    byCanon.foreach { case (cu, rs) =>
      val pages = rs.map(r => r.getAs[Long]("doc_id") % 229).distinct
      assert(pages.size == 1, s"$cu mixes logical pages $pages")
      val keepers = rs.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length == 1, s"$cu has ${keepers.length} keepers")
      assert(keepers.head.getAs[Long]("doc_id") == rs.map(_.getAs[Long]("doc_id")).min)
      assert(rs.forall(_.getAs[Long]("n_copies") == rs.length), cu)
    }
    assert(byCanon.size == out.map(_.getAs[Long]("doc_id") % 229).distinct.size)
  }

  test("robots filter: blocked exactly when the host publishes a matching prefix rule") {
    val out = OpsQueries.all("r1_robots")(spark, sf).collect()
    assert(out.nonEmpty)
    var blocked = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val h = id % 60
      val expect = (id % 5) match {
        case 1 => true                 // /private/ — every host
        case 3 => h % 3 == 0           // /admin/ — every 3rd host
        case 2 => h % 7 == 0           // /tmp/ — every 7th host
        case _ => false
      }
      assert(r.getAs[Boolean]("blocked") == expect, s"id=$id")
      if (expect) {
        blocked += 1
        assert(r.getAs[String]("matched_rule") != null, s"id=$id")
      } else assert(r.isNullAt(r.fieldIndex("matched_rule")), s"id=$id")
    }
    assert(blocked > 0)
  }

  test("bm25: contiguous ranks, non-increasing scores, heap tie-break, only term-bearing docs") {
    val out = OpsQueries.all("b1_bm25")(spark, sf).collect()
    assert(out.nonEmpty)
    val qterms = Map(0L -> Set("spark", "bmq1"), 1L -> Set("bmq2", "bmq3", "merge"),
      2L -> Set("customer", "bmq5"))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length), s"qid=$q")
      assert(sorted.length <= 10)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Long]("score"), b.getAs[Long]("score"))
          assert(sa >= sb, s"qid=$q scores must be non-increasing")
          if (sa == sb)
            assert(a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"),
              s"qid=$q equal scores must fall back to doc_id ASC (the heap tie-break)")
        case _ => ()
      }
      sorted.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val toks = (texts(id) +
          (if (id % 3 == 0) s" bmq${id % 7}" else "")).trim
          .split("[ \t\n\f\r\u000B]+").toSet
        assert(toks.intersect(qterms(q)).nonEmpty, s"qid=$q doc=$id bears no query term")
        assert(r.getAs[Long]("score") > 0, s"qid=$q doc=$id")
      }
    }
  }

  test("bpe pair counts equal a brute-force recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map[String, Long]()
    docs.foreach { txt =>
      txt.replaceAll("^ +| +$", "").split("[ \t\n\f\r\u000B]+")
        .filter(_.length >= 2).foreach { w =>
          (0 until w.length - 1).foreach { i =>
            val p = w.substring(i, i + 2)
            counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        }
    }
    val out = OpsQueries.all("t20_bpe_pairs")(spark, sf).collect()
    assert(out.map(r => r.getAs[String]("pair") -> r.getAs[Long]("cnt")).toMap
      == counts.toMap)
    val best = out.minBy(r => (-r.getAs[Long]("cnt"), r.getAs[String]("pair")))
    assert(best.getAs[Long]("rank") == 1L, "rank 1 must be the argmax merge candidate")
  }

  test("cluster sample: per-IVF-cell top-K equals the window reference") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.IvfIndex
    GraftSession.register(spark)
    val out = OpsQueries.all("s4_cluster_sample")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("rank")))
    assert(out.nonEmpty)
    // ≤K per cell, ranks contiguous from 1
    out.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.length <= 8 &&
        rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"cell $cl: ${rows.map(_._3).sorted.mkString(",")}")
    }
    // the bounded-heap result must equal the window-ranking reference
    // over the SAME training run (IvfIndex is deterministic)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = IvfIndex.train(emb, k = 16, iters = 2)
    val ref = IvfIndex.assign(emb, cents)
      .select(col("cluster"), col("vec_id"),
        shiftrightunsigned(call_function("graft_mix64", col("vec_id")), 11)
          .cast("double").as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("cluster")
        .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= 8)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Int]("cluster").toLong, r.getAs[Int]("rank").toLong))
      .sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == ref.toSeq)
  }

  test("DSIR weights equal a first-principles recomputation; plants separate") {
    import graft.expr.Hash64
    val marker = " dsq0 dsq1 dsq2 dsq3 dsq4 dsq5 dsq6 dsq7" * 3
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.replaceAll("^ +| +$", "").split("[ \t\n\f\r\u000B]+")
    def bucket(tok: String): Int = (Hash64.mix(Hash64.fnv1a(tok)) & 255L).toInt
    def bitlen(x: Long): Long =
      if (x == 0) 1L else 64L - java.lang.Long.numberOfLeadingZeros(x)
    val corpus = docs.map { case (id, t) =>
      (id, if (id % 7 == 0) t + marker else t) }
    val target = docs.filter(_._1 % 13 == 0)
      .map { case (_, t) => t.take(64) + marker }
    val tc = new Array[Long](256); val rc = new Array[Long](256)
    target.foreach(t => toks(t).foreach(w => tc(bucket(w)) += 1))
    corpus.foreach { case (_, t) => toks(t).foreach(w => rc(bucket(w)) += 1) }
    val (ttot, rtot) = (tc.sum, rc.sum)
    def wbits(b: Int): Long =
      bitlen((tc(b) + 1) * 1048576L / (ttot + 256)) -
        bitlen((rc(b) + 1) * 1048576L / (rtot + 256))
    val want = corpus.map { case (id, t) =>
      val ts = toks(t)
      id -> ((ts.length.toLong, ts.map(w => wbits(bucket(w))).sum))
    }.toMap
    val out = OpsQueries.all("t22_dsir_select")(spark, sf).collect()
    assert(out.length == want.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, imp) = want(id)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id n_tokens")
      assert(r.getAs[Long]("imp_bits") == imp, s"doc $id imp_bits")
      assert(r.getAs[Boolean]("selected") == (imp > 0), s"doc $id selected")
    }
    // planted separation: marker-tailed docs score strictly higher on
    // average, and nothing unmarked is ever selected
    val (marked, unmarked) = out.partition(_.getAs[Long]("doc_id") % 7 == 0)
    def meanIpt(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.map(_.getAs[Double]("imp_per_tok")).sum / rs.length
    assert(meanIpt(marked) > meanIpt(unmarked) + 0.5,
      s"marked ${meanIpt(marked)} vs unmarked ${meanIpt(unmarked)}")
    assert(unmarked.forall(!_.getAs[Boolean]("selected")),
      "an unmarked doc crossed the positive-LLR gate")
  }

  test("prefix shards equal a sequential running sum (sparse ids, zero weights)") {
    import graft.ops.Pack
    import spark.implicits._
    // sparse ids (×7), deterministic weights with forced zeros, input
    // deliberately NOT in id order — the packing must not care
    val data = (0 until 500).map { i =>
      val id = i.toLong * 7
      val wt = if (id % 11 == 0) 0L else ((id * 0x9E3779B97F4A7C15L) >>> 40) % 50
      (id, wt)
    }
    val shuffled = new scala.util.Random(7).shuffle(data)
    val out = Pack.prefixShards(shuffled.toDF("doc_id", "n_toks"),
        "doc_id", "n_toks", budget = 100L, bucketSize = 32L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("tok_offset"),
          r.getAs[Long]("shard")))).toMap
    assert(out.size == data.size)
    var run = 0L
    data.sortBy(_._1).foreach { case (id, wt) =>
      assert(out(id) == ((wt, run, run / 100L)),
        s"id=$id: got ${out(id)} want ($wt, $run, ${run / 100L})")
      run += wt
    }
  }

  test("redirect chains resolve to planted terminals; loops flagged unresolved") {
    import graft.ops.Graph
    import spark.implicits._
    // a 200-hop chain (needs exactly ⌈log₂200⌉=8 doubling rounds), a
    // short chain, and a 3-cycle that can never terminate
    val chain = (0L until 200L).map(i => (i, i + 1))
    val short = Seq((1000L, 1001L), (1001L, 1002L))
    val cyc = Seq((2000L, 2001L), (2001L, 2002L), (2002L, 2000L))
    val edges = (chain ++ short ++ cyc).toDF("src", "dst")
    val out = Graph.resolveChains(edges, "src", "dst", maxRounds = 8)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("final_id"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("resolved")))).toMap
    assert(out.size == 207)
    (0L to 200L).foreach { i =>
      assert(out(i) == ((200L, 200L - i, true)), s"chain node $i: ${out(i)}")
    }
    assert(out(1000L) == ((1002L, 2L, true)))
    assert(out(1001L) == ((1002L, 1L, true)))
    assert(out(1002L) == ((1002L, 0L, true)))
    Seq(2000L, 2001L, 2002L).foreach { c =>
      assert(!out(c)._3, s"cycle node $c must be unresolved")
    }
    // the doubling bound is real: 3 rounds reach ≤ 2³ hops, so distant
    // chain nodes stay unresolved while near-terminal ones finish
    val few = Graph.resolveChains(edges, "src", "dst", maxRounds = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Boolean]("resolved")).toMap
    assert(!few(0L), "200 hops cannot resolve in 3 doubling rounds")
    assert(few(195L), "5 hops must resolve within 2^3")
  }

  test("media decode: arbitrary payloads are error-as-row, never a crash") {
    import spark.implicits._
    // at 100 TB the decoders run on untrusted bytes: random tails
    // behind each real codec magic (PNG/JPEG/RIFF-WAVE/RIFF-AVI) must
    // all surface as error rows or clean decodes, never task failures
    val rows = (0 until 400).map { i =>
      val rnd = new java.util.Random(9000L + i)
      val body = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(body)
      val payload = (i % 5) match {
        case 0 => body
        case 1 => Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ body
        case 2 => Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ body
        case 3 => "RIFF".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4) ++
          "WAVE".getBytes("US-ASCII") ++ body
        case _ => "RIFF".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4) ++
          "AVI ".getBytes("US-ASCII") ++ body
      }
      Multimodal.MediaRow(i.toLong, "image", payload)
    }
    val out = Multimodal.features(rows.toDS()).collect() // must not throw
    assert(out.length == 400)
    out.foreach { r =>
      assert((r.decode_error != null) != (r.width > 0),
        s"id=${r.media_id}: exactly one of error/decoded: $r")
    }
    // the adversarial sweep must exercise the error path
    assert(out.count(_.decode_error != null) > 300)
  }

  test("multimodal: decodes a hand-built WAV fixture") {
    import spark.implicits._
    // canonical 44-byte RIFF/WAVE header + 4 frames of 16-bit PCM mono
    // at 8000 Hz, assembled field by field (NOT via AudioSystem.write):
    // samples -32768, -1, 0, 32767 → amplitude bins 0, 3, 4, 7
    val bb = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(44).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1 /* PCM */).putShort(1 /* mono */).putInt(8000)
      .putInt(16000 /* byte rate */).putShort(2 /* block align */).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(-32768).putShort(-1).putShort(0).putShort(32767)
    val out = Multimodal.features(
      Seq(Multimodal.MediaRow(2L, "audio", bb.array())).toDS()).collect().head
    assert(out.decode_error == null)
    assert(out.width == 4 && out.height == 8000 && out.n_frames == 1)
    assert(out.feature.toSeq == Seq(1f, 0f, 0f, 1f, 1f, 0f, 0f, 1f))
    // truncating mid-header (RIFF magic intact) is 'bad audio', not a crash
    val trunc = Multimodal.features(Seq(Multimodal.MediaRow(3L, "audio",
      java.util.Arrays.copyOfRange(bb.array(), 0, 20))).toDS()).collect().head
    assert(trunc.decode_error == "bad audio")
  }

  test("multimodal: MJPEG-in-AVI — every frame really decoded via imageio") {
    import spark.implicits._
    // 3-frame 11×9 container; the expected histogram is the sum of
    // INDEPENDENTLY imageio-decoded histograms of the same per-frame
    // JPEGs (frame j is seeded id + j·7 — makeAvi's layout contract)
    val (w, h, n, id) = (11, 9, 3, 42L)
    val avi = Multimodal.makeAvi(w, h, n, id)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val expected = new Array[Float](8)
    (0 until n).foreach { j =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.makeImage(w, h, id + j * 7L, "jpg")))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        expected(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1f
    }
    val out = Multimodal.features(
      Seq(Multimodal.MediaRow(7L, "video", avi)).toDS()).collect().head
    assert(out.decode_error == null)
    assert(out.width == w && out.height == h && out.n_frames == n)
    assert(out.feature.toSeq == expected.toSeq,
      "feature must equal the independently decoded per-frame histogram sum")
    // frames genuinely differ (per-frame seeds): a 1-frame container's
    // histogram ×3 must NOT reproduce the 3-frame histogram
    val one = Multimodal.features(Seq(Multimodal.MediaRow(8L, "video",
      Multimodal.makeAvi(w, h, 1, id))).toDS()).collect().head
    assert(one.feature.map(_ * 3).toSeq != out.feature.toSeq)
    // corrupting the first frame's JPEG body → bad video, error-as-row
    val corrupt = avi.clone()
    val dc = {
      var i = 12; var found = -1
      while (found < 0 && i < corrupt.length - 4) {
        if (corrupt(i) == '0' && corrupt(i + 1) == '0' &&
            corrupt(i + 2) == 'd' && corrupt(i + 3) == 'c') found = i
        i += 1
      }
      found
    }
    assert(dc > 0, "movi frame chunk present")
    java.util.Arrays.fill(corrupt, dc + 8, dc + 16, 0.toByte)
    val badFrame = Multimodal.features(
      Seq(Multimodal.MediaRow(9L, "video", corrupt)).toDS()).collect().head
    assert(badFrame.decode_error == "bad video")
    // truncation mid-header (RIFF/AVI magic intact) → bad video
    val trunc2 = Multimodal.features(Seq(Multimodal.MediaRow(10L, "video",
      java.util.Arrays.copyOfRange(avi, 0, 20))).toDS()).collect().head
    assert(trunc2.decode_error == "bad video")
  }

  test("d12 fuzzy decon: mutated-eval leaks recovered; guard fallback identical") {
    GraftSession.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 900000).as("eval_id"),
        concat(col("text"), lit(" padded for eval release")).as("text"))
    val got = Dedup.fuzzyDecontaminate(docs, evalSet, "doc_id", "text", "eval_id")
      .select("doc_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.filter(col("doc_id") % 13 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 900000)).toSet
    // the 4-word-tail mutation keeps Jaccard far above the 0.5 gate:
    // every planted leak must be flagged even though NO corpus row
    // exactly equals any eval row (the case exact decon misses)
    assert(planted.subsetOf(got), s"missed leaks: ${planted -- got}")
    // tripping the broadcast guard (shuffle fallback) changes the
    // plan, never the rows
    val gotFb = Dedup.fuzzyDecontaminate(docs, evalSet, "doc_id", "text",
        "eval_id", maxEvalDocs = 0L)
      .select("doc_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotFb == got)
  }

  test("g3 ring graph: components are exactly the congruence classes mod 6") {
    // nodes 0..59 with edges i → (i+6) mod 60: gcd(6,60)=6 rings of
    // 10 — min-label propagation must walk a real multi-round
    // diameter, and the canonical label of node i is provably i mod 6
    import spark.implicits._
    val nodes = (0L until 60L).toDF("id")
    val edges = nodes.select(col("id").as("id_a"),
      ((col("id") + 6) % 60).as("id_b"))
    val cc = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 60)
    (0L until 60L).foreach { i =>
      assert(cc(i) == i % 6, s"node $i: got ${cc(i)}, want ${i % 6}")
    }
  }

  test("t16 language-temperature sampling matches a driver-side recompute") {
    val out = OpsQueries.all("t16_lang_sample")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val maxN = counts.values.max
    val thresh = counts.view.mapValues(n =>
      math.floor(1048576.0 * math.sqrt(n.toDouble / maxN.toDouble)).toLong).toMap
    assert(out.length == docs.length)
    out.foreach { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val gate = graft.expr.Hash64.mix(id) & 1048575L
      assert(r.getLong(3) == thresh(lang), s"thresh for $lang")
      assert(r.getLong(4) == gate, s"gate for doc $id")
      assert(r.getBoolean(5) == (gate < thresh(lang)), s"kept for doc $id")
    }
    // the head language is never down-sampled (thresh = 2^20 ≥ any gate)
    val headLang = counts.maxBy(_._2)._1
    assert(out.filter(_.getString(1) == headLang).forall(_.getBoolean(5)),
      "every head-language doc must be kept")
    // at least one minority language actually drops docs (temperature
    // is doing something on this corpus)
    assert(out.exists(r => !r.getBoolean(5)), "some doc must be dropped")
  }

  test("t14 plants fire: bullet/ellipsis/symbol rules observable per modulus") {
    val out = OpsQueries.all("t14_gopher_docs")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.foreach { case (id, r) =>
      val fracBullet = r.getDouble(5)
      val fracEll = r.getDouble(6)
      if (id % 7 == 0) assert(fracBullet > 0.0, s"doc $id bullet plant")
      if (id % 11 == 0) assert(fracEll > 0.0, s"doc $id ellipsis plant")
      if (id % 13 == 0) assert(r.getDouble(4) > 0.0, s"doc $id symbol plant")
    }
    // plants only ADD lines: a doc hit by no plant has zero bullet frac
    // unless its own text carries bullets — sanity: fractions in [0,1]
    out.values.foreach { r =>
      Seq(5, 6, 7).foreach(i =>
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0))
    }
  }

  test("t15 blocklist statuses: host precedence over term, all classes fire") {
    val out = OpsQueries.all("t15_url_blocklist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    val statuses = out.map(_._3).toSet
    assert(statuses == Set("blocked_host", "blocked_term", "ok"))
    val blocked = Set(1L, 13L, 25L, 37L, 49L, 61L, 73L, 85L)
    out.foreach { case (id, host, status) =>
      val hostBlocked = blocked.contains(id % 97)
      val termHit = id % 23 == 0 || id % 29 == 0
      val want = if (hostBlocked) "blocked_host"
        else if (termHit) "blocked_term" else "ok"
      assert(status == want, s"doc $id host=$host: got $status want $want")
    }
  }
}
