package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables

class LayoutSpec extends SparkSpec {
  import sqlImplicits._

  private val sf = "/root/testdata/sf0.001"

  /** Reference Morton interleave, the obvious bit loop. */
  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the reference interleave on deterministic pairs") {
    val rng = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1)) ++
      Seq.fill(200)((rng.nextInt(1 << 21).toLong, rng.nextInt(1 << 21).toLong))
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z")).collect()
    got.foreach(r =>
      assert(r.getLong(2) === zRef(r.getLong(0), r.getLong(1), 21),
        s"(${r.getLong(0)}, ${r.getLong(1)})"))
  }

  test("z-ordered chunks have small bounding boxes in BOTH dimensions") {
    // Uniform 2-d points with EQUAL bit widths — the geometry z-order is
    // built for (mixed-width keys need scaling first, a caller concern).
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(4096)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
    def chunkStats(rows: Seq[(Long, Long)], chunk: Int): (Double, Double, Double) = {
      val boxes = rows.grouped(chunk).map { c =>
        val (xs, ys) = c.unzip
        ((xs.max - xs.min + 1).toDouble, (ys.max - ys.min + 1).toDouble)
      }.toSeq
      (boxes.map(b => b._1 * b._2).sum / boxes.size,
        boxes.map(_._1).sum / boxes.size, boxes.map(_._2).sum / boxes.size)
    }
    val z = Layout.zorderBy(pts.toDF("x", "y"), $"x", $"y", bits = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chunk = 64
    val (zArea, zX, zY) = chunkStats(z, chunk)
    val (rArea, _, _) = chunkStats(pts, chunk)           // unclustered table
    val (_, _, byXYspan) = chunkStats(z.sortBy(_._1), chunk) // single-key sort
    assert(zArea * 10 < rArea, s"z bbox $zArea not ≪ unclustered $rArea")
    // both dims bounded at once — the single-key sort leaves y unbounded
    assert(zX < 1024 / 3.0 && zY < 1024 / 3.0, s"per-chunk extents $zX × $zY")
    assert(zY * 2 < byXYspan, s"z y-extent $zY not ≪ x-sorted layout's $byXYspan")
  }

  test("compact rewrites a fragmented table to even target-size files, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$dir/frag"
    val src = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    src.repartition(37).write.parquet(path)
    // multiset compare: (orderkey, linenumber) is NOT unique in lineitem,
    // so sort fully materialized triples, not a leading-column order
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    val before = canon(src.collect())
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val fragBytes = partFiles().map(_.getLen).sum
    val target = math.max(1L, fragBytes / 3)
    val (nBefore, nAfter) = Layout.compact(spark, path, target)
    assert(nBefore === 37)
    assert(nAfter === math.ceil(fragBytes.toDouble / target).toInt)
    assert(partFiles().length === nAfter, "directory holds the compacted files")
    assert(nAfter < nBefore)
    val after = canon(spark.read.parquet(path)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice").collect())
    assert(after === before, "compaction must not change content")
    // round-robin repartition → even files (within parquet framing slack)
    val sizes = partFiles().map(_.getLen)
    assert(sizes.max < sizes.min * 2, s"files should be even, got ${sizes.toSeq}")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "._compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "._precompact")))
  }

  test("compact recovers from both crash windows of a previous run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_crash").toString
    val path = s"$dir/tbl"
    val src = Tables.load(spark, sf, "region").select($"r_regionkey", $"r_name")
    src.repartition(3).write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val bak = p.suffix("._precompact")
    // window 1: died between the renames — table gone, data in ._precompact
    assert(fs.rename(p, bak))
    val (_, n1) = Layout.compact(spark, path, 1L << 20)
    assert(n1 === 1)
    assert(spark.read.parquet(path).count() === 5, "restored then compacted")
    assert(!fs.exists(bak))
    // window 2: died after the swap, before cleanup — stale bak beside table
    fs.mkdirs(bak)
    val (_, n2) = Layout.compact(spark, path, 1L << 20)
    assert(n2 === 1)
    assert(!fs.exists(bak), "stale backup must not wedge future compactions")
    assert(spark.read.parquet(path).count() === 5)
  }
}
