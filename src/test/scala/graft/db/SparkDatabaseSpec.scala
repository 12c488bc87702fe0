package graft.db

import graft.SparkSpec
import graft.core.TestFailed

class SparkDatabaseSpec extends SparkSpec {

  lazy val db = new SparkDatabase(spark)
  import spark.implicits._

  test("execute splits multi-statement scripts, honoring quotes") {
    val r = db.execute(
      """CREATE TABLE exec_t1 AS SELECT 1 AS x;
        |CREATE TABLE exec_t2 AS SELECT ';' AS s, 2 AS x;
        |-- comment with ; inside
        |INSERT INTO exec_t1 SELECT 3""".stripMargin)
    assert(r.isRight, r)
    assert(rows(spark.table("exec_t1")) == Set(Seq(1), Seq(3)))
    assert(spark.table("exec_t2").count() == 1)
  }

  test("statement splitter edge cases") {
    assert(db.splitStatements("SELECT 1") == Seq("SELECT 1"))
    assert(db.splitStatements("a; b ;; c;") == Seq("a", "b", "c"))
    assert(db.splitStatements("SELECT ';'; SELECT 2") ==
      Seq("SELECT ';'", "SELECT 2"))
    assert(db.splitStatements("SELECT 1 -- tail; not a split\n; SELECT 2") ==
      Seq("SELECT 1 -- tail; not a split", "SELECT 2"))
    assert(db.splitStatements("SELECT /* ; */ 1; SELECT 2") ==
      Seq("SELECT /* ; */ 1", "SELECT 2"))
  }

  test("readData returns rows") {
    val Right(rs) = db.readData("SELECT 1 AS a UNION ALL SELECT 2")
    assert(rs.map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("loadDataFrame replace and append modes") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    assert(db.loadDataFrame(df, "load_t", replace = true).isRight)
    assert(spark.table("load_t").count() == 2)
    // append aligns by name even when column order differs
    val more = Seq(("z", 3L)).toDF("name", "id")
    assert(db.loadDataFrame(more, "load_t", replace = false).isRight)
    assert(rows(spark.table("load_t")) ==
      Set(Seq(1L, "x"), Seq(2L, "y"), Seq(3L, "z")))
  }

  test("createTable applies declared types as casts") {
    val ddl = Ddl(columns = Seq(
      ColumnDdl("a", dataType = Some("BIGINT")),
      ColumnDdl("b", dataType = Some("TEXT"))))
    assert(db.createTable("typed_t", "SELECT 1 AS a, 2 AS b", ddl).isRight)
    val schema = spark.table("typed_t").schema
    assert(schema("a").dataType.typeName == "long")
    assert(schema("b").dataType.typeName == "string")
  }

  test("declared TIME column materialises as STRING, values verbatim") {
    // SURVEY §1.2's documented divergence surfaced END TO END: Spark has
    // no TimeType, so a declared TIME column lands as a string table
    // column carrying the literal 'HH:MM:SS' values — and the Ddl warns.
    val ddl = Ddl(columns = Seq(ColumnDdl("t", dataType = Some("TIME"))))
    assert(ddl.typeWarnings.exists(_.contains("TIME")))
    assert(db.createTable("time_t",
      "SELECT '13:45:07' AS t UNION ALL SELECT '00:00:00' AS t", ddl).isRight)
    val tbl = spark.table("time_t")
    assert(tbl.schema("t").dataType.typeName == "string")
    assert(rows(tbl) == Set(Seq("13:45:07"), Seq("00:00:00")))
  }

  test("replaceTable is a full refresh and tolerates self-reference") {
    assert(db.replaceTable("rep_t", "SELECT 1 AS x").isRight)
    assert(db.replaceTable("rep_t", "SELECT x + 1 AS x FROM rep_t").isRight)
    assert(rows(spark.table("rep_t")) == Set(Seq(2)))
  }

  test("replaceView creates and replaces") {
    assert(db.replaceTable("view_src", "SELECT 1 AS x").isRight)
    assert(db.replaceView("v1", "SELECT * FROM view_src").isRight)
    assert(db.objectType("v1").contains("view"))
    assert(db.replaceView("v1", "SELECT x + 1 AS x FROM view_src").isRight)
    assert(rows(spark.table("v1")) == Set(Seq(2)))
  }

  test("mergeTables upserts on delete_key and drops the source") {
    Seq((1L, Some(1L), "old1"), (2L, None: Option[Long], "old2"))
      .toDF("id", "updated_at", "name")
      .write.saveAsTable("merge_dst")
    Seq((2L, Some(5L), "new2"), (3L, Some(6L), "new3"))
      .toDF("id", "updated_at", "name")
      .write.saveAsTable("merge_src")
    assert(db.mergeTables("merge_src", "merge_dst", "id").isRight)
    assert(rows(spark.table("merge_dst")) == Set(
      Seq(1L, 1L, "old1"),   // unmatched dst row kept
      Seq(2L, 5L, "new2"),   // matched dst row replaced
      Seq(3L, 6L, "new3")))  // new row inserted
    assert(!db.tableExists("merge_src"))
  }

  test("mergeQuery creates missing destination, then merges") {
    assert(db.mergeQuery("mq_t", "SELECT 1 AS id, 'a' AS v", "id").isRight)
    assert(rows(spark.table("mq_t")) == Set(Seq(1, "a")))
    assert(db.mergeQuery("mq_t", "SELECT 1 AS id, 'b' AS v", "id").isRight)
    assert(rows(spark.table("mq_t")) == Set(Seq(1, "b")))
  }

  test("moveTable replaces the destination") {
    assert(db.replaceTable("mv_src", "SELECT 1 AS x").isRight)
    assert(db.replaceTable("mv_dst", "SELECT 99 AS x").isRight)
    assert(db.moveTable("mv_src", "mv_dst").isRight)
    assert(rows(spark.table("mv_dst")) == Set(Seq(1)))
    assert(!db.tableExists("mv_src"))
  }

  test("mergeTables on a partitioned destination rewrites only touched partitions") {
    val ddl = Ddl(partitionBy = Seq("p"))
    assert(db.createTable("pmerge_dst",
      "SELECT id, CAST(id % 3 AS INT) AS p, 'old' AS v FROM RANGE(9)", ddl).isRight)
    // src touches only partition p=1
    assert(db.createTable("pmerge_src",
      "SELECT id, CAST(1 AS INT) AS p, 'new' AS v FROM RANGE(1, 9, 3)", ddl).isRight)

    def partFiles(p: Int): Set[String] = {
      val loc = spark.sql("DESCRIBE TABLE EXTENDED pmerge_dst").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val dir = new java.io.File(new java.net.URI(s"$loc/p=$p"))
      Option(dir.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    }
    val untouchedBefore = partFiles(0) ++ partFiles(2)

    assert(db.mergeTables("pmerge_src", "pmerge_dst", "id", ddl).isRight)
    // merge semantics hold: p=1 rows upserted, others untouched
    assert(spark.table("pmerge_dst").count() == 9)
    assert(rows(spark.table("pmerge_dst").filter($"p" === 1).select($"v")) ==
      Set(Seq("new")))
    assert(rows(spark.table("pmerge_dst").filter($"p" =!= 1).select($"v")) ==
      Set(Seq("old")))
    // untouched partitions' files were not rewritten
    assert(partFiles(0) ++ partFiles(2) == untouchedBefore)
    assert(!db.tableExists("pmerge_src"))
  }

  test("partitioned merge removes the stale row when a key changes partition") {
    val ddl = Ddl(partitionBy = Seq("p"))
    // id=1 lives in partition p=0; the incoming run moves it to p=1
    assert(db.createTable("pmove_dst",
      "SELECT id, CAST(id % 2 AS INT) AS p, 'old' AS v FROM RANGE(4)", ddl).isRight)
    assert(db.createTable("pmove_src",
      "SELECT CAST(0 AS BIGINT) AS id, CAST(1 AS INT) AS p, 'new' AS v", ddl).isRight)
    assert(db.mergeTables("pmove_src", "pmove_dst", "id", ddl).isRight)
    // whole-table delete semantics (merge_tables.sql): no duplicate id=0 —
    // its old p=0 row is gone, the new p=1 row is present
    assert(spark.table("pmove_dst").filter($"id" === 0).count() == 1)
    assert(rows(spark.table("pmove_dst").filter($"id" === 0).select($"p", $"v")) ==
      Set(Seq(1, "new")))
    assert(spark.table("pmove_dst").count() == 4)
  }

  test("partitioned merge clears a partition that empties entirely") {
    val ddl = Ddl(partitionBy = Seq("p"))
    // p=0 holds exactly ids 0 and 2; the incoming run moves BOTH to p=1,
    // so partition p=0 must end up empty — dynamic overwrite alone would
    // leave its old files (no p=0 rows are written) and the stale ids
    // would resurface as duplicates
    assert(db.createTable("pempty_dst",
      "SELECT id, CAST(id % 2 AS INT) AS p, 'old' AS v FROM RANGE(4)", ddl).isRight)
    assert(db.createTable("pempty_src",
      "SELECT id, CAST(1 AS INT) AS p, 'new' AS v FROM RANGE(0, 4, 2)", ddl).isRight)
    assert(db.mergeTables("pempty_src", "pempty_dst", "id", ddl).isRight)
    assert(spark.table("pempty_dst").filter($"p" === 0).count() == 0)
    assert(spark.table("pempty_dst").count() == 4)
    assert(rows(spark.table("pempty_dst").filter($"id" === 0).select($"p", $"v")) ==
      Set(Seq(1, "new")))
  }

  test("mergeTables preserves the destination's declared layout") {
    val ddl = Ddl(sortBy = Seq("id"))
    assert(db.createTable("lmerge_dst",
      "SELECT id, 'old' AS v FROM RANGE(5)", ddl).isRight)
    Seq((2L, "new")).toDF("id", "v").write.saveAsTable("lmerge_src")
    assert(db.mergeTables("lmerge_src", "lmerge_dst", "id", ddl).isRight)
    assert(spark.table("lmerge_dst").count() == 5)
    assert(rows(spark.table("lmerge_dst").filter($"id" === 2).select($"v")) ==
      Set(Seq("new")))
  }

  test("multiple unique tests share one grouping-sets pass (incl. null groups)") {
    val ddl = Ddl(columns = Seq(
      ColumnDdl("a", tests = Seq(UniqueTest)),
      ColumnDdl("b", tests = Seq(UniqueTest)),
      ColumnDdl("c", tests = Seq(NotNullTest))))
    val df = Seq(
      (1L, Some("p"), None: Option[Long]),
      (1L, Some("q"), None),
      (2L, Some("q"), Some(5L)),
      (3L, None, Some(6L)),
      (4L, None, Some(7L))).toDF("a", "b", "c")
    val report = db.violationReport(df, ddl).get
    assert(rows(report) == Set(
      Seq("1", 2L, "unique", "a"),
      Seq("q", 2L, "unique", "b"),
      Seq(null, 2L, "unique", "b"),
      Seq(null, 2L, "not_null", "c")))
    // the two unique tests run as ONE grouping-sets aggregation: exactly
    // one Expand in the optimized plan (N groupBys would have none but N
    // separate exchanges over N scans)
    val plan = report.queryExecution.optimizedPlan.toString
    assert(plan.split("Expand").length - 1 == 1, plan)
  }

  test("acidMerge flag routes to DELETE+INSERT and fails loudly on v1 tables") {
    // no ACID catalog is bundled, so on plain parquet the DELETE FROM
    // must surface Spark's v2-tables error — loud misconfiguration, not
    // silent degradation (docs/ACID_MERGE.md)
    val acidDb = new SparkDatabase(spark, acidMerge = true)
    assert(acidDb.replaceTable("acid_dst", "SELECT id, 'old' AS v FROM RANGE(4)").isRight)
    assert(acidDb.replaceTable("acid_src", "SELECT 1 AS id, 'new' AS v").isRight)
    val r = acidDb.mergeTables("acid_src", "acid_dst", "id")
    assert(r.isLeft)
    assert(r.left.exists(_.toString.toLowerCase.contains("delete")))
    // destination untouched, source not dropped
    assert(spark.table("acid_dst").count() == 4)
    assert(acidDb.tableExists("acid_src"))
  }

  test("moveTable keeps the destination alive when the rename fails") {
    assert(db.replaceTable("atomic_dst", "SELECT 1 AS x").isRight)
    // src missing → ALTER TABLE RENAME throws → backup must be restored
    assert(db.moveTable("no_such_src_table", "atomic_dst").isLeft)
    assert(db.tableExists("atomic_dst"))
    assert(rows(spark.table("atomic_dst")) == Set(Seq(1)))
  }

  test("bucketed tables (cluster ddl) join without a shuffle exchange") {
    val ddl = Ddl(clusterBy = Seq("id"), buckets = 4)
    assert(db.createTable("bk_left",
      "SELECT id, id * 2 AS a FROM RANGE(1000)", ddl).isRight)
    assert(db.createTable("bk_right",
      "SELECT id, id * 3 AS b FROM RANGE(1000)", ddl).isRight)
    // small fixtures would broadcast (also shuffle-free, but that proves
    // nothing about bucketing) — force the sort-merge path to show the
    // co-located join: both sides pre-bucketed on the key with the same
    // bucket count need NO shuffle exchange, the point of cluster/bucket
    // DDL at 100 TB where neither side broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_left")
        .join(spark.table("bk_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("post hooks fire exactly once, after the destination swap") {
    val ddl = Ddl(postHooks = Seq(
      "INSERT INTO hook_log SELECT COUNT(*) FROM hook_t"))
    assert(db.execute("CREATE TABLE hook_log (n BIGINT)").isRight)
    assert(db.replaceTable("hook_t", "SELECT 1 AS x UNION ALL SELECT 2", ddl).isRight)
    // one hook row, and it observed the final table (2 rows), not a tmp
    assert(rows(spark.table("hook_log")) == Set(Seq(2L)))
    assert(db.mergeQuery("hook_t", "SELECT 3 AS x", "x", ddl).isRight)
    assert(spark.table("hook_log").count() == 2)
  }

  test("standard tests: pass on clean data") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "cat").write.saveAsTable("clean_t")
    val ddl = Ddl(columns = Seq(
      ColumnDdl("id", tests = Seq(UniqueTest, NotNullTest)),
      ColumnDdl("cat", tests = Seq(AllowedValuesTest(Seq("a", "b"))))))
    assert(db.standardTests("clean_t", ddl).isRight)
  }

  test("standard tests: report duplicates, nulls, out-of-domain values") {
    Seq((Some(1L), "a"), (Some(1L), "b"), (None, "zzz"))
      .toDF("id", "cat").write.saveAsTable("dirty_t")
    val ddl = Ddl(columns = Seq(
      ColumnDdl("id", tests = Seq(UniqueTest, NotNullTest)),
      ColumnDdl("cat", tests = Seq(AllowedValuesTest(Seq("a", "b"))))))
    val Left(e: TestFailed) = db.standardTests("dirty_t", ddl)
    val report = e.offending.mkString("\n")
    assert(report.contains("unique"))
    assert(report.contains("not_null") || report.contains("allowed_values"))
  }

  test("custom test passes iff query returns no rows") {
    assert(db.customTest("SELECT 1 WHERE 1 = 0").isRight)
    assert(db.customTest("SELECT 1").isLeft)
  }

  test("partitioned create lays out partition directories") {
    val ddl = Ddl(partitionBy = Seq("p"))
    assert(db.createTable(
      "part_t", "SELECT id, id % 2 AS p FROM RANGE(10)", ddl).isRight)
    assert(spark.table("part_t").count() == 10)
    // partition column present in catalog partitioning
    val cat = spark.sql("DESCRIBE TABLE EXTENDED part_t").collect().map(_.getString(0))
    assert(cat.contains("# Partition Information"))
  }

  test("compactTable rewrites fragmented files losslessly, no-ops when compact") {
    spark.range(1000).toDF("id").repartition(16)
      .write.mode("overwrite").saveAsTable("compact_t")
    assert(spark.table("compact_t").inputFiles.length == 16)
    val r = db.compactTable("compact_t", targetRowsPerFile = 500L)
    assert(r == Right((16L, 2L, 1000L)))
    assert(spark.table("compact_t").inputFiles.length == 2)
    // content survives byte-identical
    assert(spark.table("compact_t").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 1000L))
    // already at/below target → reported as-is, nothing rewritten
    assert(db.compactTable("compact_t", 500L) == Right((2L, 2L, 1000L)))
    // invalid target is a typed error, not an exception
    assert(db.compactTable("compact_t", 0L).isLeft)
  }
}
