package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contract tests for the edit-distance pair family: both the
  * label-blocked and the banded form must ENFORCE their block-size
  * bound (VERDICT r10 #1 — the label-blocked form was the one
  * unguarded block-quadratic left), and the banded form's bucketed
  * equi-join must return exactly the brute-force semantics its oracle
  * SQL declares (prefix-12 equality, length within 10, Levenshtein on
  * the 24-char prefix).
  */
class TextPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("label-blocked edit pairs: the block-size contract is enforced, not just documented") {
    val ex = intercept[IllegalStateException] {
      TextQueries.editPairs(spark, dir, maxBlock = 1L).collect()
    }
    assert(ex.getMessage.contains("quadratic per block"))
    assert(ex.getMessage.contains("text_edit_distance_pairs_banded"))
    // the default bound admits the harness blocks: query still runs
    assert(graft.SparkEntry.queries("text_edit_distance_pairs")(spark, dir).limit(1).count() >= 0)
  }

  test("banded edit pairs: the worst-bucket contract is enforced") {
    val ex = intercept[IllegalStateException] {
      TextQueries.editPairsBanded(spark, dir, maxBlock = 1L).collect()
    }
    assert(ex.getMessage.contains("banded edit-distance bucket"))
    assert(ex.getMessage.contains("dedup_exact"))
  }

  test("banded bucket join returns exactly the brute-force prefix/length-window semantics") {
    // reference: the declared semantics computed WITHOUT the band trick
    // (single equi-join on p12, residuals as plain filters)
    val d = graft.ops.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"),
        substring(col("text"), 1, 12).as("p12"),
        substring(col("text"), 1, 24).as("pfx"))
    val a = d.select(col("doc_id").as("a_id"), col("p12"), col("len").as("a_len"), col("pfx").as("pa"))
    val b = d.select(col("doc_id").as("b_id"), col("p12").as("q12"), col("len").as("b_len"), col("pfx").as("pb"))
    val ref = a.join(b, col("p12") === col("q12") && col("a_id") < col("b_id"))
      .filter(abs(col("a_len") - col("b_len")) <= 10)
      .withColumn("dist", levenshtein(col("pa"), col("pb")))
      .filter(col("dist") <= 10)
      .select(col("a_id"), col("b_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val banded = TextQueries.editPairsBanded(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    assert(banded.toSet === ref, "banded candidates must cover every qualifying pair")
    assert(banded.length === banded.toSet.size,
      "each qualifying pair must meet in exactly one band key (no duplicates)")
  }
}
