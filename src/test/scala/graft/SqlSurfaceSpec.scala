package graft

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** The SQL surface (GraftExtensions): every graft kernel callable from
  * `spark.sql(...)` must produce bit-identical results to the Scala
  * Column API, arrive via the `spark.sql.extensions` hook (SparkTestBase
  * sets the config; nothing here calls register()), and keep constant
  * arguments analysis-time-checked.
  */
class SqlSurfaceSpec extends SparkTestBase {

  private lazy val fixture: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("HTTP://EX.com:80/a/../b?q=1#frag", "http://ex.com/",
        """see http://foo.com/x%20y and <a href="/rel/p?page=2">l</a> or https://B.org:443/.""",
        Seq("the", "quick", "brown", "fox", "the", "quick"),
        Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0)),
      ("https://sub.ex.org/%7Euser/%2e%2e/x", null,
        "no links here", Seq("one", "two"),
        Seq(-1.0, 0.0, 4.5), Seq(2.0, 2.0, 2.0)),
      (null, null, null, Seq.empty[String], Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0))
    ).toDF("url", "base", "text", "words", "va", "vb")
  }

  /** SQL text vs the Column-API twin: same rows, same values, same order. */
  private def sqlEqualsDsl(name: String, sqlExpr: String, dsl: DataFrame => DataFrame): Unit = {
    fixture.createOrReplaceTempView("sql_surface_t")
    val viaSql = spark.sql(s"SELECT $sqlExpr AS r FROM sql_surface_t").collect().toSeq
    val viaDsl = dsl(fixture).collect().toSeq
    assert(viaSql == viaDsl, s"$name: SQL and Column API disagree")
  }

  test("graft_canonicalize (1- and 2-arg) matches the Column API") {
    sqlEqualsDsl("canonicalize2", "graft_canonicalize(url, base)",
      _.select(canonicalize_url(col("url"), col("base")).as("r")))
    sqlEqualsDsl("canonicalize1", "graft_canonicalize(url)",
      _.select(canonicalize_url(col("url")).as("r")))
    // spot value: the RFC normalization actually ran through SQL
    val r = spark.sql(
      "SELECT graft_canonicalize('HTTP://EX.com:80/a/../b?q=1#frag')").head.getString(0)
    assert(r == "http://ex.com/b?q=1")
  }

  test("graft_extract_urls / graft_host_of / graft_path_of match the Column API") {
    sqlEqualsDsl("extract_urls", "graft_extract_urls(text)",
      _.select(extract_urls(col("text")).as("r")))
    sqlEqualsDsl("host_of", "graft_host_of(graft_canonicalize(url))",
      _.select(host_of(canonicalize_url(col("url"))).as("r")))
    sqlEqualsDsl("path_of", "graft_path_of(graft_canonicalize(url))",
      _.select(path_of(canonicalize_url(col("url"))).as("r")))
  }

  test("graft_url_hash / graft_url_salt match the Column API") {
    sqlEqualsDsl("url_hash", "graft_url_hash(graft_canonicalize(url))",
      _.select(url_hash(canonicalize_url(col("url"))).as("r")))
    sqlEqualsDsl("url_salt", "graft_url_salt(graft_canonicalize(url), 8)",
      _.select(url_salt(canonicalize_url(col("url")), 8).as("r")))
  }

  test("vector kernels match the Column API through SQL") {
    sqlEqualsDsl("vec_dot", "graft_vec_dot(va, vb)",
      _.select(vec_dot(col("va"), col("vb")).as("r")))
    sqlEqualsDsl("vec_cosine", "graft_vec_cosine(va, vb)",
      _.select(vec_cosine(col("va"), col("vb")).as("r")))
    sqlEqualsDsl("vec_dist2", "graft_vec_dist2(va, vb)",
      _.select(vec_dist2(col("va"), col("vb")).as("r")))
    val w = Array(Array(0.25, -1.0, 0.5), Array(-0.75, 0.1, 0.0))
    sqlEqualsDsl("rhp_sig",
      "graft_rhp_sig(va, array(array(0.25D, -1.0D, 0.5D), array(-0.75D, 0.1D, 0.0D)))",
      _.select(rhp_sig(col("va"), w).as("r")))
  }

  test("text dedup kernels match the Column API through SQL") {
    sqlEqualsDsl("minhash_sigs", "graft_minhash_sigs(words, 8)",
      _.select(minhash_sigs(col("words"), 8).as("r")))
    sqlEqualsDsl("simhash32", "graft_simhash32(words)",
      _.select(simhash32(col("words")).as("r")))
    sqlEqualsDsl("ngram_hashes", "graft_ngram_hashes(words, 5)",
      _.select(ngram_hashes(col("words"), 5).as("r")))
  }

  /** All messages down the cause chain (Spark may wrap a builder's
    * exception in an AnalysisException). */
  private def chainMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("constant arguments are rejected at analysis time when non-foldable") {
    fixture.createOrReplaceTempView("sql_surface_t")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sigs(words, cast(size(words) AS INT)) FROM sql_surface_t").collect()
    }
    assert(chainMessages(e1).contains("constant INT"), s"got: ${chainMessages(e1)}")
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_canonicalize() FROM sql_surface_t").collect()
    }
    assert(chainMessages(e2).contains("argument"), s"got: ${chainMessages(e2)}")
  }

  test("SQL path stays in whole-stage codegen (no UDF, no fallback)") {
    // a parquet-backed table, not the in-memory fixture —
    // ConvertToLocalRelation folds projections over a LocalRelation at
    // optimize time, which would hide the runtime plan this test pins
    val pq = "target/sql-surface-fixture"
    fixture.write.mode("overwrite").parquet(pq)
    spark.read.parquet(pq).createOrReplaceTempView("sql_surface_t")
    val df = spark.sql(
      """SELECT graft_url_hash(graft_canonicalize(url)) h,
        |       graft_extract_urls(text) links,
        |       graft_minhash_sigs(words, 4) sigs,
        |       graft_vec_cosine(va, vb) cos
        |FROM sql_surface_t WHERE url IS NOT NULL""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    // SQL registration resolves to the SAME Catalyst expressions as the
    // Column API: their prettyNames in the plan, a whole-stage-codegen
    // stage (the "*(n)" marker), and no UDF wrapper anywhere
    Seq("canonicalize_url", "extract_urls", "minhash_sigs", "vec_cosine")
      .foreach(n => assert(plan.contains(n), s"missing $n in:\n$plan"))
    assert(plan.contains("*("), s"no whole-stage codegen stage in:\n$plan")
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(df.collect().length == 2)
  }

  test("post-hoc register() is idempotent and equivalent to the extensions hook") {
    GraftExtensions.register(spark) // overwrite-registers every function
    GraftExtensions.register(spark) // and again — must not throw
    val r = spark.sql("SELECT graft_simhash32(array('a','b','a'))").head.getLong(0)
    val d = fixture.sparkSession.range(1)
      .select(simhash32(expr("array('a','b','a')"))).head.getLong(0)
    assert(r == d)
  }
}
