package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end curation binary: curated corpus lands partitioned by
  * split, and the manifest's funnel is internally consistent with both
  * the decision query and the files on disk. */
class CurateMainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("curate run writes a split-partitioned corpus and a consistent manifest") {
    val out = Files.createTempDirectory("curate").toString
    val manifest = CurateMain.run(spark, dir, out)

    // manifest written and parseable (same JSON the driver-side tools read)
    val onDisk = Files.readString(java.nio.file.Paths.get(s"$out/manifest.json"))
    assert(onDisk === manifest)
    def field(k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(manifest)
        .map(_.group(1).toLong)
        .getOrElse(fail(s"manifest missing $k: $manifest"))

    val selected = field("n_selected")
    assert(field("n_ingested") > selected && selected > 0)
    assert(field("n_canonical") >= selected && field("n_quality_ok") >= selected)
    assert(field("n_within_cap") === selected,
      "selection IS the post-gate source cap")

    // the written corpus IS the selected set, and the split dirs add up
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() === selected)
    val bySplit = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum === selected)
    assert(bySplit.keys.toSeq.map(s => field(s"n_$s")).sum === selected,
      s"manifest split counts must cover the corpus: $manifest")
    // partition pruning surface: the split really is a partition column
    assert(Files.list(java.nio.file.Paths.get(s"$out/corpus")).toArray
      .map(_.toString).exists(_.contains("split=train")))

    // agreement with the oracle-checked decision query
    val q = SparkEntry.queries("pipeline_curate_corpus")(spark, dir)
      .filter(col("selected")).count()
    assert(q === selected)
  }
}
