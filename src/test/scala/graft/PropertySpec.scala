package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY.md §5.2 item 3) via raw ScalaCheck
  * driven from ScalaTest (no scalatestplus bridge in the offline
  * cache). Deterministic: fixed ScalaCheck seed parameters, small
  * case counts (each case runs Spark jobs).
  */
class PropertySpec extends SparkTestBase {

  private def check(prop: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  private lazy val totalOrders = Tables.orders(spark, sf).count().toInt

  test("pagination: any (offset, limit) window is the matching slice of the sorted relation") {
    val all = Tables.orders(spark, sf).orderBy("o_orderkey")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val gen = for {
      off <- Gen.choose(0, totalOrders + 10)
      lim <- Gen.choose(1, 200)
    } yield (off, lim)
    check(Prop.forAll(gen) { case (off, lim) =>
      val page = Relational.paginateAsc(spark, sf, off, lim)
        .select("o_orderkey").collect().map(_.getLong(0)).toSeq
      page == all.slice(off, off + lim)
    })
  }

  test("LIKE filter result is a subset of the scan, and monotone in the needle") {
    val gen = Gen.oneOf("wid", "bolt", "rod", "blue", "xyz_nomatch", "e", "")
    check(Prop.forAll(gen) { key =>
      val filtered = Relational.likeSubstring(spark, sf, key)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      val scan = Tables.part(spark, sf).select("p_partkey")
        .collect().map(_.getLong(0)).toSet
      val longer = Relational.likeSubstring(spark, sf, key + "q")
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      filtered.subsetOf(scan) && longer.subsetOf(filtered)
    }, cases = 5)
  }

  test("top-k equals the k-prefix of the full sort for any k") {
    val full = Tables.customer(spark, sf)
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    check(Prop.forAll(Gen.choose(1, 60)) { k =>
      Relational.topKByScore(spark, sf, k)
        .select("c_custkey").collect().map(_.getLong(0)).toSeq == full.take(k)
    }, cases = 6)
  }

  test("keyset pagination pages equal offset pagination pages (same total order)") {
    // walk the first 3 pages by cursor and compare with offset slices
    val all = Tables.orders(spark, sf)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    check(Prop.forAll(Gen.choose(10, 80)) { pageSize =>
      var cursor = ("9999-12-31 23:59:59", Long.MaxValue)
      (0 until 3).forall { pageNo =>
        val page = Relational.keysetPage(spark, sf, cursor._1, cursor._2, pageSize)
          .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
        val expected = all.slice(pageNo * pageSize, (pageNo + 1) * pageSize)
          .map { case (t, k) => (t, k) }
        if (page.nonEmpty) cursor = (page.last._1, page.last._2)
        page == expected
      }
    }, cases = 4)
  }

  test("rollup totals are consistent for arbitrary month subsets of the data") {
    check(Prop.forAll(Gen.choose(1995, 2001)) { y =>
      val rows = Analytics.rollupSales(spark, sf).collect()
      val months = rows.filter(r => !r.isNullAt(0) && r.getInt(0) == y && !r.isNullAt(1))
        .map(_.getDouble(2)).sum
      val yearRow = rows.filter(r => !r.isNullAt(0) && r.getInt(0) == y && r.isNullAt(1))
      yearRow.isEmpty || math.abs(yearRow.head.getDouble(2) - months) < 0.05
    }, cases = 4)
  }

  test("chunking tiles every document exactly for any (size, stride <= size)") {
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    val gen = for {
      sz <- Gen.choose(4, 64)
      st <- Gen.choose(1, sz)
    } yield (sz, st)
    check(Prop.forAll(gen) { case (sz, st) =>
      val byDoc = DataPrep.chunkDocuments(spark, sf, sz, st).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      byDoc.keySet == lens.keySet && byDoc.forall { case (docId, rows) =>
        val covered = rows.flatMap { r =>
          val start = r.getAs[Int]("chunk_id") * st + 1
          start until (start + r.getAs[Int]("n_tokens"))
        }.toSet
        covered == (1 to lens(docId)).toSet
      }
    }, cases = 6)
  }

  test("histogram: for any width, buckets partition all orders and bound min/max") {
    val total = Tables.orders(spark, sf).count()
    val gen = Gen.oneOf(1000.0, 12345.0, 25000.0, 60000.0, 250000.0)
    check(Prop.forAll(gen) { width =>
      val rows = Analytics.totalpriceHistogram(spark, sf, width).collect()
      rows.map(_.getAs[Long]("n")).sum == total &&
        rows.forall { r =>
          val b = r.getAs[Int]("bucket")
          // 1-ULP-scale tolerance: floor(x/width) and the x >= b*width
          // re-check are INDEPENDENT float computations — for
          // non-dyadic widths a value can floor into bucket b+1 while
          // sitting a hair under (b+1)*width. That's float geometry,
          // not an operator defect; assert with a relative slack.
          r.getAs[Double]("min_price") >= b * width - width * 1e-12 &&
            r.getAs[Double]("max_price") < (b + 1) * width + width * 1e-12
        }
    }, cases = 5)
  }

  test("source quota: for any quota, per-source counts are min(quota, source size)") {
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val gen = Gen.choose(1, 40)
    check(Prop.forAll(gen) { q =>
      val perSource = DataPrep.sourceQuota(spark, sf, q).collect()
        .groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
      sizes.forall { case (src, n) =>
        perSource.getOrElse(src, 0L) == math.min(q.toLong, n)
      }
    }, cases = 6)
  }

  test("deterministic shuffle: any prefix size yields a dense prefix of one fixed permutation") {
    val full = DataPrep.deterministicShuffle(spark, sf, topK = Int.MaxValue)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val gen = Gen.choose(1, full.length)
    check(Prop.forAll(gen) { k =>
      val page = DataPrep.deterministicShuffle(spark, sf, topK = k)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      page == full.take(k)
    }, cases = 6)
  }
}
