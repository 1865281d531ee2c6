package graft.io

import java.sql.DriverManager
import graft.SparkSpec

/** S1: the reference's primary source is a warehouse over a wire protocol
  * (Snowflake/ODBC). Our engine's equivalent is spark.read.jdbc — proven
  * here against an embedded Derby database (ships with Spark), including
  * predicate pushdown into the remote query. */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc")
    val u = s"jdbc:derby:${dir.toString}/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE person (patient_linkage VARCHAR(32), year_of_birth INT)")
    (1 to 50).foreach(i =>
      st.execute(s"INSERT INTO person VALUES ('P$i', ${1950 + i})"))
    st.close(); conn.close()
    u
  }

  test("spark.read.jdbc pulls a warehouse table with pushed-down predicates") {
    val df = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "person")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .filter("year_of_birth <= 1970")
    assert(df.count() === 20)
    // the filter must be pushed into the JDBC scan, not applied post-fetch
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("YEAR_OF_BIRTH"), plan.take(500))
  }

  test("partitioned JDBC read splits the table across concurrent queries") {
    val df = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "person")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("partitionColumn", "year_of_birth")
      .option("lowerBound", "1950").option("upperBound", "2001")
      .option("numPartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 50) // no row lost or duplicated across partitions
  }
}
