package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue2 interleaves bits (known values) and is monotone per quadrant") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), 4).as("z"))
      .as[Long].collect().toSeq
    // x bits at even positions, y bits at odd: (5,3)=0b101,0b011 ->
    // z = 1<<0 | 1<<4 | 1<<1 | 1<<3 = 0b11011 = 27
    assert(got == Seq(0L, 1L, 2L, 3L, 27L))
  }

  /** per-row-group [min,max] of a column across all files in `dir` */
  private def rowGroupStats(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { bl =>
          val c = bl.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val s = c.getStatistics
          (s.genericGetMin.asInstanceOf[Number].longValue,
            s.genericGetMax.asInstanceOf[Number].longValue)
        } finally r.close()
      }
  }

  test("z-ordered layout prunes a 2-D box where single-column sort cannot") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"))
    // small row groups so the 60k-row table splits into many — the unit
    // of skipping parquet actually offers
    def write(df: org.apache.spark.sql.DataFrame, sub: String): String = {
      val p = s"$base/$sub"
      df.coalesce(1).write.option("parquet.block.size", 32 * 1024).parquet(p)
      p
    }
    val byOrder = write(li.sort(col("l_orderkey")), "by_order")
    // normalize BOTH dimensions to the same 10-bit bucket range first —
    // interleaving raw values with unequal ranges lets the wider
    // dimension's high bits dominate the key and destroys clustering in
    // the narrower one (the scaladoc's normalization requirement)
    val maxRow = li.agg(max("l_orderkey"), max("l_partkey")).head()
    val (maxO, maxP) = (maxRow.getLong(0), maxRow.getLong(1))
    val byZ = write(
      li.withColumn("__z", ZOrder.zValue2(
          expr(s"l_orderkey * 1024 div ${maxO + 1}"),
          expr(s"l_partkey * 1024 div ${maxP + 1}"), 10))
        .sort(col("__z")).drop("__z"), "by_z")

    // the probe: a narrow l_partkey band (the UNSORTED dimension of the
    // single-column layout), any l_orderkey
    val (p0, p1) = (100L, 200L)
    def matching(dir: String): (Int, Int) = {
      val stats = rowGroupStats(dir, "l_partkey")
      assert(stats.size >= 10, s"$dir produced only ${stats.size} row groups")
      (stats.count { case (lo, hi) => lo <= p1 && hi >= p0 }, stats.size)
    }
    val (ordHit, ordAll) = matching(byOrder)
    val (zHit, zAll) = matching(byZ)
    // orderkey-sorted: partkey is uniform inside every row group — the
    // band intersects (almost) all of them. z-ordered: partkey is
    // clustered too, so most row groups are skippable on stats alone.
    assert(ordHit >= (ordAll * 9) / 10,
      s"single-column sort unexpectedly clustered partkey: $ordHit/$ordAll")
    assert(zHit * 2 < ordHit,
      s"z-order pruned too little: $zHit/$zAll vs $ordHit/$ordAll")
    // and the layouts hold identical data
    assert(spark.read.parquet(byZ).count() == spark.read.parquet(byOrder).count())
  }
}
