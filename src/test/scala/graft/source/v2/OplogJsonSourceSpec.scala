package graft.source.v2

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The DSv2 oplog connector must push ns/ts predicates and prune
  * columns (the reference's server-side Mongo query options, O1/O2),
  * and follow the per-event error contract on malformed lines. */
class OplogJsonSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("oplog-jsonl").toString
    val f1 = Seq(
      """{"ts":100,"op":"i","ns":"db.c","id":"a","doc":{"_id":"a","v":1},"fromMigrate":false}""",
      """{"ts":200,"op":"u","ns":"db.c","id":"a","doc":{"$set":{"v":2}}}""",
      """{"ts":300,"op":"d","ns":"other.ns","id":"x","doc":{"_id":"x"}}""",
      """not json — must drop, not kill the scan""",
    )
    val f2 = Seq(
      """{"ts":400,"op":"i","ns":"db.c","id":"b","doc":{"_id":"b","v":3},"fromMigrate":true}""",
      """{"ts":50,"op":"i","ns":"db.c","id":"old","doc":{"_id":"old","v":0}}""",
    )
    Files.write(java.nio.file.Paths.get(dir, "part1.jsonl"), f1.mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "part2.jsonl"), f2.mkString("\n").getBytes)
    dir
  }

  private def load(dir: String) =
    spark.read.format("graft.source.v2.OplogJsonSource").option("path", dir).load()

  test("reads all well-formed rows; malformed lines drop") {
    val df = load(writeFixture())
    assert(df.count() === 5) // 6 lines written, 1 malformed
    assert(df.schema.fieldNames.toSeq ===
      Seq("ts", "op", "ns", "id", "doc", "fromMigrate"))
  }

  test("ns equality and ts lower bound are pushed into the reader") {
    val df = load(writeFixture())
      .filter(col("ns") === "db.c" && col("ts") >= 100L)
    assert(df.count() === 3) // drops other.ns and ts=50
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"), plan.take(1200))
    assert(plan.contains("ns") && plan.contains("ts"), plan.take(1200))
    // row content survives the pushed path intact
    val byId = df.collect().map(r => (r.getAs[String]("id"), r.getAs[Long]("ts"))).toSet
    assert(byId === Set(("a", 100L), ("a", 200L), ("b", 400L)))
  }

  test("column pruning reaches the reader (ReadSchema excludes doc)") {
    val df = load(writeFixture()).select("ns", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("doc#") || !plan.substring(plan.indexOf("Scan")).contains("doc"),
      plan.take(1200))
    assert(df.count() === 5)
  }

  test("streams as micro-batches with maxFilesPerTrigger admission control") {
    val dir = writeFixture()
    val ckpt = Files.createTempDirectory("oplog-stream-ckpt").toString
    val stream = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .option("path", dir)
      .option("maxFilesPerTrigger", "1")
      .load()
      .filter(col("ns") === "db.c")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("oplog_stream_out")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    // 2 files -> 2 non-empty micro-batches; 4 db.c rows total
    assert(batches === 2, q.recentProgress.map(_.numInputRows).mkString(","))
    assert(spark.sql("SELECT count(*) FROM oplog_stream_out").collect().head.getLong(0) === 4L)
  }

  test("maxRowsPerTrigger admission caps rows per micro-batch (docs/sec token-bucket analog)") {
    val dir = writeFixture() // f1: 4 non-empty lines, f2: 2
    val ckpt = Files.createTempDirectory("oplog-rows-ckpt").toString
    val q = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .option("path", dir)
      .option("maxRowsPerTrigger", "3")
      .load()
      .writeStream.outputMode("append").format("memory")
      .queryName("oplog_rows_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows).toSeq
    q.stop()
    // file granularity, ≥1 file per trigger: f1 alone busts the 3-row
    // budget (admitted alone, 3 valid rows out), then f2 (2 rows)
    assert(batches === Seq(3, 2), batches.mkString(","))
  }

  test("maxRowsPerTrigger large enough admits everything in one batch") {
    val dir = writeFixture()
    val ckpt = Files.createTempDirectory("oplog-rows1-ckpt").toString
    val q = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .option("path", dir)
      .option("maxRowsPerTrigger", "100")
      .load()
      .writeStream.outputMode("append").format("memory")
      .queryName("oplog_rows1_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches === 1)
    assert(spark.sql("SELECT count(*) FROM oplog_rows1_out").collect().head.getLong(0) === 5L)
  }

  test("byte-range splitting: a large file fans out to many partitions, rows exactly once") {
    val dir = Files.createTempDirectory("oplog-split").toString
    val rows = (0 until 200).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"k$i","doc":{"_id":"k$i","v":$i}}"""
    }
    Files.write(java.nio.file.Paths.get(dir, "big.jsonl"), rows.mkString("\n").getBytes)
    val unsplit = load(dir).collect().map(_.getAs[String]("id")).sorted
    assert(unsplit.length === 200)
    // force many ranges: split size far below file size, boundaries
    // landing mid-line almost everywhere
    for (split <- Seq(64L, 301L, 997L)) {
      val df = spark.read.format("graft.source.v2.OplogJsonSource")
        .option("path", dir).option("splitSizeBytes", split.toString).load()
      assert(df.rdd.getNumPartitions > 1, s"split=$split must yield multiple partitions")
      val got = df.collect().map(_.getAs[String]("id")).sorted
      assert(got === unsplit, s"split=$split lost or duplicated lines")
    }
  }

  test("byte-range splitting: boundary exactly on a line start keeps the line once") {
    val dir = Files.createTempDirectory("oplog-split-edge").toString
    val l1 = """{"ts":1,"op":"i","ns":"db.c","id":"a","doc":{"_id":"a"}}"""
    val l2 = """{"ts":2,"op":"i","ns":"db.c","id":"b","doc":{"_id":"b"}}"""
    Files.write(java.nio.file.Paths.get(dir, "edge.jsonl"), s"$l1\n$l2".getBytes)
    // split size = len(l1)+1: range 2 starts exactly at l2's first byte
    val split = l1.getBytes.length + 1
    val df = spark.read.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("splitSizeBytes", split.toString).load()
    assert(df.rdd.getNumPartitions === 2)
    assert(df.collect().map(_.getAs[String]("id")).sorted.toSeq === Seq("a", "b"))
  }

  test("streaming also range-splits admitted files (offsets stay file-granular)") {
    val dir = Files.createTempDirectory("oplog-split-stream").toString
    val ckpt = Files.createTempDirectory("oplog-split-stream-ckpt").toString
    val rows = (0 until 50).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"s$i","doc":{"_id":"s$i"}}"""
    }
    Files.write(java.nio.file.Paths.get(dir, "big.jsonl"), rows.mkString("\n").getBytes)
    val q = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("splitSizeBytes", "128")
      .load()
      .writeStream.outputMode("append").format("memory")
      .queryName("split_stream_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    assert(spark.sql("SELECT count(DISTINCT id) FROM split_stream_out")
      .collect().head.getLong(0) === 50L)
    assert(spark.sql("SELECT count(*) FROM split_stream_out")
      .collect().head.getLong(0) === 50L)
  }

  test("gzip dumps decompress, mix with plain files, and never byte-split") {
    val dir = Files.createTempDirectory("oplog-gz").toString
    val rows = (0 until 200).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"g$i","doc":{"_id":"g$i","v":$i}}"""
    }
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/dump.jsonl.gz"))
    gz.write(rows.mkString("\n").getBytes); gz.close()
    Files.write(java.nio.file.Paths.get(dir, "plain.jsonl"),
      """{"ts":999,"op":"i","ns":"db.c","id":"p","doc":{"_id":"p","v":9}}""".getBytes)

    val got = load(dir).collect().map(_.getAs[String]("id")).sorted
    assert(got.length === 201, "all gzip rows + the plain row")
    assert(got.contains("g0") && got.contains("g199") && got.contains("p"))

    // gzip is not seekable: even a tiny splitSizeBytes must plan the
    // .gz as ONE whole-file partition (the plain file may still split)
    val parts = OplogScan.splitFile(s"$dir/dump.jsonl.gz", 64L, FsIO.driverConf)
    assert(parts.length === 1, "gzip file must never byte-split")
    val df = spark.read.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("splitSizeBytes", "64").load()
    assert(df.collect().map(_.getAs[String]("id")).sorted === got,
      "tiny split size must not lose or duplicate gzip rows")
  }

  test("gzip dumps stream under maxRowsPerTrigger admission; empty gz yields no rows") {
    val dir = Files.createTempDirectory("oplog-gz-stream").toString
    val rows = (0 until 20).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"s$i","doc":{"_id":"s$i","v":$i}}"""
    }
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/dump.jsonl.gz"))
    gz.write(rows.mkString("\n").getBytes); gz.close()
    // a zero-byte .gz: behaves like an empty .jsonl, not a scan-killer
    Files.write(java.nio.file.Paths.get(dir, "empty.jsonl.gz"), Array.emptyByteArray)

    // row-budget admission must COUNT the gzip file's lines (decoded),
    // not die decoding compressed bytes in latestOffset
    val out = Files.createTempDirectory("oplog-gz-stream-out").toString
    val q = spark.readStream.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("maxRowsPerTrigger", "7").load()
      .writeStream.format("memory").queryName("gz_admit_out")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT id FROM gz_admit_out")
      .collect().map(_.getString(0)).sorted
    assert(got.length === 20, "all decoded rows arrive; the empty gz adds none")
  }

  test("gz row-budget admission extrapolates from the 64 KB sample; no driver full decode") {
    val dir = Files.createTempDirectory("oplog-gz-big").toString
    // ~10k rows, ~700 KB decompressed: well past the sample window, so
    // admission must use the ISIZE extrapolation — and still deliver
    // every row across the admitted micro-batches
    val rows = (0 until 10000).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"g$i","doc":{"_id":"g$i","v":$i}}"""
    }
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/big.jsonl.gz"))
    gz.write(rows.mkString("\n").getBytes); gz.close()

    val out = Files.createTempDirectory("oplog-gz-big-out").toString
    val q = spark.readStream.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("maxRowsPerTrigger", "4000").load()
      .writeStream.format("memory").queryName("gz_big_out")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT id FROM gz_big_out").count() === 10000L)
  }

  test("a gzip dump truncated mid-body serves its readable prefix instead of killing the scan") {
    val dir = Files.createTempDirectory("oplog-gz-torn").toString
    val rows = (0 until 500).map { i =>
      s"""{"ts":$i,"op":"i","ns":"db.c","id":"t$i","doc":{"_id":"t$i","v":$i}}"""
    }
    val full = java.nio.file.Paths.get(dir, "full.bin")
    val gz = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(full.toFile))
    gz.write(rows.mkString("\n").getBytes); gz.close()
    // keep a valid header but tear the body (and the trailer with it)
    val bytes = Files.readAllBytes(full)
    Files.write(java.nio.file.Paths.get(dir, "torn.jsonl.gz"),
      java.util.Arrays.copyOf(bytes, (bytes.length * 6) / 10))
    Files.delete(full)

    // batch read: the decodable prefix arrives, no exception
    val got = load(dir).collect().map(_.getAs[String]("id"))
    assert(got.nonEmpty && got.length < 500,
      s"expected a proper prefix of the 500 rows, got ${got.length}")

    // streaming with row-budget admission: latestOffset must not choke
    // on the torn trailer either (the gz row count is an estimate)
    val out = Files.createTempDirectory("oplog-gz-torn-out").toString
    val q = spark.readStream.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("maxRowsPerTrigger", "100").load()
      .writeStream.format("memory").queryName("gz_torn_out")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT id FROM gz_torn_out").count() === got.length.toLong)
  }

  test("CRLF line endings parse and empty files yield no rows") {
    val dir = Files.createTempDirectory("oplog-crlf").toString
    Files.write(java.nio.file.Paths.get(dir, "crlf.jsonl"), (
      """{"ts":1,"op":"i","ns":"db.c","id":"a","doc":{"_id":"a"}}""" + "\r\n" +
      """{"ts":2,"op":"i","ns":"db.c","id":"b","doc":{"_id":"b"}}""" + "\r\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "empty.jsonl"), Array.empty[Byte])
    val ids = load(dir).collect().map(_.getAs[String]("id")).sorted.toSeq
    assert(ids === Seq("a", "b"))
  }

  test("non-positive splitSizeBytes fails fast instead of silently dropping data") {
    val dir = writeFixture()
    val df = spark.read.format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("splitSizeBytes", "-1").load()
    val e = intercept[Exception] { df.count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("splitSizeBytes")), e.toString)
  }

  test("IsNotNull is NOT pushed: rows with missing keys still filter correctly") {
    val dir = Files.createTempDirectory("oplog-nulls").toString
    Files.write(java.nio.file.Paths.get(dir, "p.jsonl"), Seq(
      """{"ts":1,"op":"i","ns":"db.c","id":"a","doc":{"_id":"a"}}""",
      """{"ts":2,"op":"d","ns":"db.c","id":"z"}""", // no doc key -> null column
    ).mkString("\n").getBytes)
    val df = load(dir)
    assert(df.count() === 2)
    // the null-doc row must be excluded post-scan, not wrongly returned
    assert(df.filter(col("doc").isNotNull).count() === 1)
    assert(df.filter(col("doc").isNull).select("id").collect().head.getString(0) === "z")
  }

  test("late-arriving file that sorts before consumed files is read exactly once") {
    val dir = Files.createTempDirectory("oplog-late").toString
    val ckpt = Files.createTempDirectory("oplog-late-ckpt").toString
    Files.write(java.nio.file.Paths.get(dir, "z.jsonl"),
      """{"ts":1,"op":"i","ns":"db.c","id":"z1","doc":{"_id":"z1"}}""".getBytes)
    val q = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .option("path", dir).option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.outputMode("append").format("memory")
      .queryName("late_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // a file sorting BEFORE the consumed one arrives late
    Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      """{"ts":2,"op":"i","ns":"db.c","id":"a1","doc":{"_id":"a1"}}""".getBytes)
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT id FROM late_out").collect().map(_.getString(0)).toSeq
    // both rows exactly once: no re-emission of z, no skipping of a
    assert(ids.sorted === Seq("a1", "z1"))
  }

  test("discovery log survives restart: late earlier-sorting file not re-read or skipped") {
    val dir = Files.createTempDirectory("oplog-restart").toString
    val ckpt = Files.createTempDirectory("oplog-restart-ckpt").toString
    val outDir = Files.createTempDirectory("oplog-restart-out").toString
    // parquet sink: supports restart from the same checkpoint
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.source.v2.OplogJsonSource")
        .option("path", dir).load()
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    Files.write(java.nio.file.Paths.get(dir, "z.jsonl"),
      """{"ts":1,"op":"i","ns":"db.c","id":"z1","doc":{"_id":"z1"}}""".getBytes)
    runOnce()
    // while the query is DOWN, an earlier-sorting file arrives
    Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      """{"ts":2,"op":"i","ns":"db.c","id":"a1","doc":{"_id":"a1"}}""".getBytes)
    runOnce() // fresh stream object, same checkpoint
    // total output: each row exactly once — z1 not re-emitted, a1 not skipped
    val ids = spark.read.parquet(outDir).select("id").collect().map(_.getString(0)).toSeq
    assert(ids.sorted === Seq("a1", "z1"))
  }

  test("lines without an integer ts are malformed and dropped (ordering soundness)") {
    val dir = Files.createTempDirectory("oplog-badts").toString
    Files.write(java.nio.file.Paths.get(dir, "p.jsonl"), Seq(
      """{"ts":100,"op":"i","ns":"db.c","id":"ok","doc":{"_id":"ok"}}""",
      """{"ts":100.0,"op":"i","ns":"db.c","id":"dbl","doc":{"_id":"dbl"}}""",
      """{"op":"i","ns":"db.c","id":"none","doc":{"_id":"none"}}""",
    ).mkString("\n").getBytes)
    val ids = load(dir).collect().map(_.getAs[String]("id")).toSeq
    assert(ids === Seq("ok"))
  }

  test("connector rows feed the CDC pipeline end to end") {
    import graft.cdc.{BatchApplier, OplogRow, StateStore}
    import OplogRow.encoder
    val df = load(writeFixture())
      .filter(col("ns") === "db.c" && !col("fromMigrate"))
    val task = graft.model.TaskSpec(Vector("v" -> "v"))
    val out = BatchApplier.applyOplogBatch(
        df.as[OplogRow], StateStore.empty(spark), task)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("doc")).toMap
    // a: insert + $set folded; old: plain insert; b: filtered (fromMigrate)
    assert(out === Map(
      "a" -> """{"_id":"a","v":2}""",
      "old" -> """{"_id":"old","v":0}""",
    ))
  }
}
