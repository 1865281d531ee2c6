package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** `tune()` must APPEND GraftExtensions to extensions the caller already
  * configured, not overwrite them (round-4 advice) — spark.sql.extensions
  * is a comma-separated list and last-write-wins would silently drop the
  * caller's classes. Builder-only tests: no session is created. */
class GraftSessionSpec extends AnyFunSuite {

  private def extensionsOf(b: SparkSession.Builder): String =
    GraftSqlBridge.builderOption(b, "spark.sql.extensions").getOrElse("")

  test("tune() preserves caller-configured extensions by appending") {
    val b = SparkSession.builder()
      .config("spark.sql.extensions", "com.example.CallerExtensions")
    GraftSession.tune(b)
    assert(extensionsOf(b) ===
      "com.example.CallerExtensions," + GraftSession.ExtensionsClass)
  }

  test("tune() sets GraftExtensions alone when nothing was configured") {
    val b = SparkSession.builder()
    GraftSession.tune(b)
    assert(extensionsOf(b) === GraftSession.ExtensionsClass)
  }

  test("tune() is idempotent: no duplicate GraftExtensions entry") {
    val b = SparkSession.builder()
      .config("spark.sql.extensions",
        s"com.example.CallerExtensions,${GraftSession.ExtensionsClass}")
    GraftSession.tune(b)
    GraftSession.tune(b)
    assert(extensionsOf(b) ===
      "com.example.CallerExtensions," + GraftSession.ExtensionsClass)
  }
}
