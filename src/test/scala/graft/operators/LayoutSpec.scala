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

  test("compactPartitioned compacts every leaf, preserving the partition layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part").toString
    val root = s"$dir/tbl"
    val src = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        year($"o_orderdate").as("yr"), $"o_orderpriority".substr(1, 1).as("pri"))
    src.repartition(7).write.partitionBy("yr", "pri").parquet(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafDirs(): Seq[String] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
        val st = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
        if (st.exists(s => s.isFile && s.getPath.getName.startsWith("part-"))) Seq(p)
        else st.filter(_.isDirectory).flatMap(d => walk(d.getPath)).toSeq
      }
      walk(new org.apache.hadoop.fs.Path(root)).map(_.toString).sorted
    }
    val leavesBefore = leafDirs()
    assert(leavesBefore.size > 4, "two-level partitioning must fan out")
    // partition-value inference reads pri="1" back as Integer — compare
    // both partition columns as strings
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.get(3).toString, r.get(4).toString)).sorted.toSeq
    val before = canon(src.collect())
    val res = Layout.compactPartitioned(spark, root, targetFileBytes = 1L << 30)
    assert(res.map(_._1) === leafDirs(), "report covers exactly the leaves, sorted")
    assert(leafDirs() === leavesBefore, "partition directories unchanged")
    // each leaf held up to 7 fragments (a writer task skips a leaf it got
    // no rows for); all collapse to one target-size file
    res.foreach { case (l, b, a) =>
      assert(b >= 2, s"$l fragmented input"); assert(a === 1, s"$l compacted")
    }
    val after = canon(spark.read.parquet(root)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"yr", $"pri")
      .collect())
    assert(after === before, "content (incl. partition values) must be intact")
  }

  test("compactPartitioned recovers a leaf whose previous compaction crashed mid-swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part_crash").toString
    val root = s"$dir/tbl"
    Tables.load(spark, sf, "nation").select($"n_nationkey", $"n_name", $"n_regionkey")
      .repartition(4).write.partitionBy("n_regionkey").parquet(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // window 1 on one leaf: the swap's first rename happened, the second
    // didn't — the leaf is GONE, its data parked under ._precompact
    val leaf = new org.apache.hadoop.fs.Path(root, "n_regionkey=2")
    assert(fs.rename(leaf, leaf.suffix("._precompact")))
    val res = Layout.compactPartitioned(spark, root, targetFileBytes = 1L << 30)
    assert(res.exists(_._1 == leaf.toString), "crashed leaf must be found and recovered")
    assert(!fs.exists(leaf.suffix("._precompact")))
    assert(spark.read.parquet(root).count() === 25, "no partition lost")
    assert(spark.read.parquet(root).filter($"n_regionkey" === 2).count() === 5)
  }

  test("compactPartitioned recovers when the crashed leaf is the ROOT itself") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_root_crash").toString
    val path = s"$dir/tbl"
    Tables.load(spark, sf, "region").select($"r_regionkey", $"r_name")
      .repartition(3).write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    // unpartitioned table (single-leaf degenerate case), crash between the
    // two swap renames: root gone, data parked in a SIBLING ._precompact
    assert(fs.rename(p, p.suffix("._precompact")))
    val res = Layout.compactPartitioned(spark, path, targetFileBytes = 1L << 20)
    assert(res.map(r => (r._2, r._3)) === Seq((3, 1)))
    assert(spark.read.parquet(path).count() === 5, "restored then compacted")
    assert(!fs.exists(p.suffix("._precompact")))
  }

  test("compact with sortBy preserves clustering: output files cover disjoint key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_sorted").toString
    val path = s"$dir/ztbl"
    val rng = new scala.util.Random(13)
    val pts = Seq.fill(8192)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
    // a z-ordered table written fragmented (many small sorted files)
    Layout.zorderBy(pts.toDF("x", "y"), $"x", $"y", bits = 10)
      .repartition(23).write.parquet(path)
    val (b, a) = Layout.compact(spark, path, targetFileBytes = 1L << 14,
      sortBy = Seq(Layout.zValue($"x", $"y", bits = 10)))
    assert(b === 23 && a > 1, s"want a multi-file compaction, got $b -> $a")
    // per-file z ranges must not overlap — that IS the pruning property;
    // round-robin compaction would give every file the full z range
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"), Layout.zValue($"x", $"y", bits = 10).as("z"))
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length === a)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file z-ranges overlap: $hi1 > $lo2")
      case _ => ()
    }
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
