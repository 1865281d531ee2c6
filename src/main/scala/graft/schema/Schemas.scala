package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for every input table — never schema inference
  * (SURVEY.md §1.2: the reference loses types at each CSV boundary and
  * re-infers; we type once at the edge so every engine path agrees).
  *
  * Two families:
  *  - the driver testdata tables (TESTDATA.md, TPC-H-ish + events/docs/embeddings)
  *  - the OMOP CDM tables the reference pipeline consumes (SURVEY.md §1.3)
  */
object Schemas {

  // ---------------------------------------------------------------- testdata
  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // Canonical ENGINE-FACING schema: ts is Spark's microsecond TimestampType.
  // The parquet file's physical encoding of ts has changed under us before
  // (TIMESTAMP(NANOS) → TIMESTAMP(MICROS), round-7 regression): the loader
  // (graft.io.Tables.loadEvents) inspects the parquet footer and picks the
  // matching READ schema via [[eventsWithTs]], then normalizes to this one.
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Read-schema variant of [[events]] with `ts` re-typed: LongType for
    * TIMESTAMP(NANOS) files (with spark.sql.legacy.parquet.nanosAsLong),
    * TimestampNTZType for TIMESTAMP(isAdjustedToUTC=false, MICROS/MILLIS)
    * files. The loader casts/converts back to the canonical TimestampType. */
  def eventsWithTs(dt: DataType): StructType =
    StructType(events.map(f => if (f.name == "ts") f.copy(dataType = dt) else f))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** All driver testdata tables by name. */
  val testdata: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  // ---------------------------------------------------------------- OMOP CDM
  // Column set = exactly what the reference touches (SURVEY.md §1.3, with
  // file:line citations there). All dates are DateType at the edge.
  val person = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("YEAR_OF_BIRTH", IntegerType),
    StructField("GENDER_CONCEPT_ID", LongType),
    StructField("ETHNICITY_SOURCE_VALUE", StringType),
    StructField("GENDER_SOURCE_VALUE", StringType),
    StructField("LOCATION_ZIP", StringType),
    StructField("LOCATION_STATE", StringType)))

  val conditionOccurrence = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("CONDITION_CONCEPT_ID", LongType),
    StructField("CONDITION_CONCEPT_DESC", StringType),
    StructField("CONDITION_START_DATE", DateType)))

  val measurement = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("MEASUREMENT_CONCEPT_ID", LongType),
    StructField("MEASUREMENT_CONCEPT_DESC", StringType),
    StructField("MEASUREMENT_DATE", DateType),
    StructField("VALUE_AS_NUMBER", DoubleType),
    StructField("UNIT_CONCEPT_ID", LongType),
    StructField("UNIT_CONCEPT_DESC", StringType)))

  val observation = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("OBSERVATION_CONCEPT_ID", LongType),
    StructField("OBSERVATION_DATE", DateType)))

  val procedureOccurrence = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("PROCEDURE_CONCEPT_ID", LongType),
    StructField("PROCEDURE_DATE", DateType)))

  val drugExposure = StructType(Seq(
    StructField("PATIENT_LINKAGE", StringType),
    StructField("DRUG_CONCEPT_ID", LongType),
    StructField("DRUG_EXPOSURE_START_DATE", DateType)))

  val codelist = StructType(Seq(StructField("concept_id", LongType)))

  val omop: Map[String, StructType] = Map(
    "person" -> person,
    "condition_occurrence" -> conditionOccurrence,
    "measurement" -> measurement,
    "observation" -> observation,
    "procedure_occurrence" -> procedureOccurrence,
    "drug_exposure" -> drugExposure)
}
