package graft

import org.apache.spark.sql.functions._

/** Pins for the text-analysis operators whose production shape is a
  * custom kernel: the kernel must stay bit-identical to the plain
  * relational formulation it replaced (which is also what the DuckDB
  * oracle computes).
  */
class TextAnalysisSpec extends SparkFunSuite {
  import spark.implicits._

  test("token_stats equals the explode + double-groupBy formulation on real docs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val viaKernel = SparkEntry.queries("text_repetition")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    val viaExplode = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("n_tokens"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("distinct_tokens"), max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        ((col("n_tokens") - col("distinct_tokens")).cast("double")
          / col("n_tokens")).as("dup_frac"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_tok_frac"),
        (col("top_c") * 5 <= col("n_tokens") &&
          (col("n_tokens") - col("distinct_tokens")) * 2 <= col("n_tokens"))
          .cast("int").as("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    assert(viaKernel.size == viaExplode.size && viaKernel.size > 0)
    assert(viaKernel == viaExplode,
      "kernel and relational formulation must agree doc-for-doc, bit-for-bit")
  }

  test("token_stats edge tokens: doubled spaces, empty text, single token") {
    import graft.functions.TokenStats.token_stats
    val df = Seq(
      (1L, "a b  b c"), // doubled space -> empty token counts as a token
      (2L, ""),         // split('') = [''] -> one token
      (3L, "x"),
      (4L, "y y y y")
    ).toDF("id", "t")
      .select(col("id"), token_stats(split(col("t"), " ")).as("s"))
      .select(col("id"), col("s.n_tokens"), col("s.distinct_tokens"), col("s.top_c"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(df(1L) == ((5, 4L, 2L)), s"got ${df(1L)}") // tokens: a,b,'',b,c
    assert(df(2L) == ((1, 1L, 1L)))
    assert(df(3L) == ((1, 1L, 1L)))
    assert(df(4L) == ((4, 1L, 4L)))
  }

  test("text_repetition plan is a zero-shuffle projection") {
    val plan = SparkEntry.queries("text_repetition")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc repetition stats must not shuffle:\n$plan")
  }
}
