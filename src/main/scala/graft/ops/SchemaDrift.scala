package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Assert-and-adapt guard for the harness fixture schemas.
  *
  * The driver regenerates `/root/testdata` between rounds and its
  * physical schemas have drifted before (round 8: `events.ts` went from
  * TIMESTAMP(NANOS) to plain `timestamp[us]`, silently breaking 30
  * queries and 43 tests). The reference engine never faces this class
  * of failure because its inputs are self-describing BSON documents
  * (reference `src/types.ts:3-6` passes documents through untyped); a
  * Spark engine binds a static schema at analysis time, so the
  * tolerance the reference gets for free has to be won back explicitly
  * at the load boundary.
  *
  * Policy, per table column:
  *   - exact canonical type        → pass through untouched (no cast
  *     node, so scans keep their pushdown/pruning shape)
  *   - tolerated physical drift    → a single cast to the canonical
  *     type (integer widths, float→double, timestamp precision or
  *     tz-ness, array element widths)
  *   - anything else, or a missing column → fail FAST with a named
  *     per-column diff, so the next silent fixture regeneration
  *     produces one readable error instead of 43 downstream analysis
  *     exceptions.
  *
  * Extra columns the engine does not know about pass through —
  * forward-compatible by default, same as the reference's handling of
  * unknown document fields.
  */
object SchemaDrift {

  /** Canonical logical schema per harness table (TESTDATA.md): the
    * types every downstream operator and oracle twin was validated
    * against. Timestamps written as `timestamp[us]` load as
    * TIMESTAMP_NTZ in Spark 4 (parquet.inferTimestampNTZ default) and
    * all relational queries were built against that, so NTZ *is* the
    * canonical type for orders/lineitem. `events.ts` is canonicalized
    * by [[Tables.events]] to a true TimestampType plus a nanos long —
    * here it may arrive as either a timestamp or the legacy
    * nanosAsLong LongType, both tolerated (see `extraAccepted`). */
  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  /** Per-column types accepted UNCHANGED beyond the tolerated-cast
    * rule: `events.ts` as a nanosecond long (the pre-r8 TIMESTAMP(NANOS)
    * fixture under nanosAsLong) passes through for [[Tables.events]] to
    * convert — a blind cast long→timestamp would misinterpret nanos as
    * seconds. */
  private val extraAccepted: Map[(String, String), Set[DataType]] =
    Map(("events", "ts") -> Set[DataType](LongType))

  private def integral(t: DataType) = t match {
    case ByteType | ShortType | IntegerType | LongType => true; case _ => false
  }
  private def fractional(t: DataType) = t match {
    case FloatType | DoubleType | _: DecimalType => true; case _ => false
  }
  private def timestampy(t: DataType) = t match {
    case TimestampType | TimestampNTZType => true; case _ => false
  }

  /** None = accepted as-is; Some(cast) = tolerated drift; throw = no. */
  private def adaptColumn(
      table: String, name: String, actual: DataType, canon: DataType
  ): Option[Column] = {
    if (actual == canon) None
    else if (extraAccepted.getOrElse((table, name), Set.empty).contains(actual)) None
    else {
      val ok = (actual, canon) match {
        case (a, c) if integral(a) && integral(c) => true
        case (a, c) if (integral(a) || fractional(a)) && fractional(c) => true
        case (a, c) if timestampy(a) && timestampy(c) => true
        case (ArrayType(a, _), ArrayType(c, _))
            if (integral(a) || fractional(a)) && fractional(c) => true
        case _ => false
      }
      if (!ok) throw new IllegalStateException(
        s"fixture schema drift in table '$table': column '$name' is " +
          s"${actual.simpleString}, engine supports ${canon.simpleString} " +
          "(or a tolerated numeric/timestamp variant). Regenerate the " +
          "fixture or extend SchemaDrift.expected.")
      Some(col(name).cast(canon))
    }
  }

  /** Validate `df` against the canonical schema of `table`; cast
    * tolerated drifts, pass exact matches and unknown extras through
    * untouched, fail with a named diff otherwise. Tables not in
    * [[expected]] (test temp dirs etc.) pass through. */
  def adapt(table: String, df: DataFrame): DataFrame =
    expected.get(table) match {
      case None => df
      case Some(cols) =>
        val actual = df.schema.map(f => f.name -> f.dataType).toMap
        val missing = cols.collect { case (n, _) if !actual.contains(n) => n }
        if (missing.nonEmpty) throw new IllegalStateException(
          s"fixture schema drift in table '$table': missing column(s) " +
            s"${missing.mkString(", ")}; fixture has " +
            s"${df.schema.fieldNames.mkString(", ")}")
        val casts = cols.flatMap { case (n, canon) =>
          adaptColumn(table, n, actual(n), canon).map(n -> _)
        }.toMap
        if (casts.isEmpty) df
        else df.select(df.schema.fieldNames.toIndexedSeq.map { n =>
          casts.get(n).map(_.as(n)).getOrElse(col(n))
        }: _*)
    }
}
