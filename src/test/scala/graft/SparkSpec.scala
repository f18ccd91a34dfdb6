package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * getOrCreate reuses across suites in the forked test JVM). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = { /* session shared; not stopped */ }

  /** Synthetic `events.parquet` in the testdata schema: each user's
    * item-visit sequence becomes consecutive ts-ordered events with
    * `{"k": item}` props — the one events-writer for graph-derived
    * specs, so the schema contract lives in a single place. */
  def writeItemEvents(dir: String, visits: Seq[(Long, Seq[Long])]): Unit = {
    import spark.implicits._
    val rows = for {
      (user, ks) <- visits
      (k, i) <- ks.zipWithIndex
    } yield (user * 1000L + i, (i + 1) * 1000L, user, "c", 1.0,
      s"""{"k": $k}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
