package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Scalar-function catalog (SURVEY.md §2.9, F1–F15).
  *
  * The reference implements these as Python string/regex/datetime
  * helpers; here each is a codegen'd built-in (`functions._` — no
  * UDFs), so they fuse into whole-stage codegen with the surrounding
  * plan and push down where the optimizer allows.
  */
object Scalars extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: regex datetime extraction (reference parses
    // '2025年8月10日1点场' titles, db/recording.py:22-33). We build the
    // title from o_orderdate and extract it back — rows whose title
    // doesn't match are dropped, like the reference's insert filter.
    "f1_regex_datetime" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .where(col("o_orderkey") < 5000)
        .withColumn("title",
          concat(year(col("o_orderdate")), lit("年"),
            month(col("o_orderdate")), lit("月"),
            dayofmonth(col("o_orderdate")), lit("日8点场直播")))
        .withColumn("ey", regexp_extract(col("title"), "(\\d{4})年(\\d{1,2})月(\\d{1,2})日(\\d{1,2})点场", 1))
        .withColumn("em", regexp_extract(col("title"), "(\\d{4})年(\\d{1,2})月(\\d{1,2})日(\\d{1,2})点场", 2))
        .withColumn("ed", regexp_extract(col("title"), "(\\d{4})年(\\d{1,2})月(\\d{1,2})日(\\d{1,2})点场", 3))
        .where(col("ey") =!= "")
        .select(col("o_orderkey"), col("title"),
          col("ey").cast("int").as("ey"),
          col("em").cast("int").as("em"),
          col("ed").cast("int").as("ed"))
    }),

    // F2: first-matching-pattern extraction with preserved order
    // (reference tries 《》, 『』, 「」 in order, modal/video.py:14-18).
    "f2_first_pattern" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          coalesce(
            nullif(regexp_extract(col("p_name"), "(widget)", 1), lit("")),
            nullif(regexp_extract(col("p_name"), "(bolt)", 1), lit("")),
            nullif(regexp_extract(col("p_name"), "(gear)", 1), lit("")),
            lit("other")).as("kind"))
    }),

    // F3: epoch/instant → Asia/Shanghai date parts (partition keys;
    // reference modal/transcribe.py:139-146). Asia/Shanghai is a fixed
    // +08:00 for all post-1991 instants, so the offset form is exact
    // and keeps the oracle engine-agnostic.
    "f3_tz_date_parts" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .withColumn("sh", from_utc_timestamp(col("ts"), "+08:00"))
        .groupBy(year(col("sh")).as("y"), month(col("sh")).as("m"),
          dayofmonth(col("sh")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    }),

    // F4: strftime-style naming (reference cmdline.py:437).
    "f4_strftime" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .where(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd_HH-mm-ss").as("stamp"))
    }),

    // F5: seconds → hh:mm:ss (reference cmdline.py:549-568).
    "f5_seconds_hms" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .where(col("event_id") < 2000)
        .withColumn("secs", col("event_id") % 90000)
        .select(col("event_id"),
          format_string("%02d:%02d:%02d",
            floor(col("secs") / 3600).cast("int"),
            floor((col("secs") % 3600) / 60).cast("int"),
            (col("secs") % 60).cast("int")).as("hms"))
    }),

    // F6: hive-style object-key construction
    // (reference modal/stream.py:344, audio/{mid}/{y}/{m:02d}/{d:02d}/…).
    "f6_key_construction" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .withColumn("sh", from_utc_timestamp(col("ts"), "+08:00"))
        .select(col("event_id"),
          concat(lit("audio/"), col("user_id"), lit("/"),
            year(col("sh")), lit("/"),
            lpad(month(col("sh")).cast("string"), 2, "0"), lit("/"),
            lpad(dayofmonth(col("sh")).cast("string"), 2, "0"), lit("/"),
            col("event_id"), lit(".mp4")).as("key"))
    }),

    // F7 + F8 + F9 + F15: prefix match, split+size, join, indexing
    // (reference transcribe.py:75-77, fuzz.py:21-35).
    "f7_string_ops" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .where(col("text").startsWith("the "))
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          array_join(slice(split(col("text"), " "), 1, 3), "_").as("first3"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          element_at(split(col("text"), " "), -1).as("last_tok"))
    }),

    // F11: JSON parse (reference json.load of transcripts/meta;
    // testdata events.props is the JSON column).
    "f11_json_extract" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
    }),

    // F11/VARIANT: Spark 4's semi-structured ingestion path — the
    // modern spelling of the reference's schema-on-read JSON
    // (cmdline.py:545 json.loads of heterogeneous props payloads).
    // Where f11_json_extract needs a declared struct schema up front,
    // a 100 TB ingest of heterogeneous payloads parses ONCE to the
    // VARIANT binary encoding (`parse_json`) and every downstream
    // query extracts typed fields lazily (`variant_get` with a target
    // type and a path, nested objects and array indexing included) —
    // no schema migration when payloads grow fields. The payload here
    // is CONSTRUCTED from table columns (int, string, array, nested
    // object) so the DuckDB oracle can restate the build + every
    // extraction with its JSON functions, hash-pinning that the
    // variant round-trip preserves values AND types end-to-end.
    // EdgeCaseSpec pins the type surface: bigint/string extraction
    // types, missing-path null, and JSON-null vs missing via
    // is_variant_null.
    "f11_variant" -> ((s, dir) => {
      val payload = concat(
        lit("{\"id\":"), col("event_id"),
        lit(",\"type\":\""), col("event_type"),
        lit("\",\"k\":"), get_json_object(col("props"), "$.k"),
        lit(",\"tags\":[\"t\","), col("event_id") % 7,
        lit("],\"meta\":{\"d\":"), col("user_id") % 5, lit("}}"))
      Tables.load(s, dir, "events")
        .where(col("event_id") % 97 === 0)
        .withColumn("v", parse_json(payload))
        .select(col("event_id"),
          variant_get(col("v"), "$.id", "bigint").as("vid"),
          variant_get(col("v"), "$.type", "string").as("vtype"),
          variant_get(col("v"), "$.k", "bigint").as("vk"),
          variant_get(col("v"), "$.tags[1]", "bigint").as("vtag"),
          variant_get(col("v"), "$.meta.d", "bigint").as("vmeta"))
    }),

    // F11/VARIANT with HETEROGENEOUS payloads — the schema-on-read
    // case VARIANT exists for (VERDICT r16 #5): fields present on
    // some rows and absent on others, and ONE key ("x") carrying a
    // NUMBER on some rows and a non-numeric STRING on others,
    // extracted with BOTH target types. try_variant_get gives the
    // null-on-cast-failure read (the string rows' "x" cannot be
    // bigint), plain variant_get("string") gives the lossless read
    // (numbers cast to their decimal text) — the exact pair of
    // semantics a mixed-type column needs downstream. The DuckDB
    // oracle restates the per-row payload drift with CASE and the
    // extractions with json_extract_string + TRY_CAST, hash-pinning
    // values across all three payload shapes; EdgeCaseSpec pins the
    // failure semantics themselves (strict variant_get THROWS on the
    // mixed-type row, try_variant_get nulls).
    "f11_variant_hetero" -> ((s, dir) => {
      val c = pmod(col("event_id"), lit(3))
      val payload =
        when(c === 0, concat(lit("{\"id\":"), col("event_id"),
          lit(",\"x\":"), col("user_id") % 1000,
          lit(",\"extra\":\""), col("event_type"), lit("\"}")))
        .when(c === 1, concat(lit("{\"id\":"), col("event_id"),
          lit(",\"x\":\"s"), col("user_id") % 1000, lit("\"}")))
        .otherwise(concat(lit("{\"id\":"), col("event_id"),
          lit(",\"note\":\"n\"}")))
      Tables.load(s, dir, "events")
        .where(col("event_id") % 89 === 0)
        .withColumn("v", parse_json(payload))
        .select(col("event_id"),
          variant_get(col("v"), "$.id", "bigint").as("vid"),
          try_variant_get(col("v"), "$.x", "bigint").as("x_long"),
          variant_get(col("v"), "$.x", "string").as("x_str"),
          variant_get(col("v"), "$.extra", "string").as("extra"))
    }),

    // F11/PERMISSIVE: malformed-record ingestion semantics — the
    // production contract a 100 TB JSON ingest actually runs under
    // (the reference's json.load calls simply throw on bad payloads,
    // cmdline.py:545 — fine for one file, fatal for a corpus where
    // 0.1% of rows are truncated uploads). Spark's PERMISSIVE mode
    // with columnNameOfCorruptRecord: well-formed rows parse to typed
    // fields, malformed rows yield NULL fields and carry the raw
    // payload in the corrupt column — the quarantine-table pattern
    // (route `is_corrupt` rows to a dead-letter sink, keep the scan
    // flowing). Corruption is CONSTRUCTED deterministically (brace
    // truncation and non-JSON garbage — invalid under any parser) so
    // the DuckDB oracle restates the routing with json_valid + CASE,
    // hash-pinning both the parsed values and the quarantined
    // payloads. EdgeCaseSpec pins the mode surface itself: FAILFAST
    // throws on the same rows PERMISSIVE quarantines.
    "f11_json_malformed" -> ((s, dir) => {
      val good = concat(lit("{\"k\":"), get_json_object(col("props"), "$.k"),
        lit(",\"t\":\""), col("event_type"), lit("\"}"))
      val payload =
        when(col("event_id") % 13 === 0, good.substr(lit(1), length(good) - 1))
        .when(col("event_id") % 17 === 0, lit("not json"))
        .otherwise(good)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_corrupt",
          org.apache.spark.sql.types.StringType)))
      Tables.load(s, dir, "events")
        .where(col("event_id") % 7 === 0)
        .withColumn("j", from_json(payload, schema, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")))
        .select(col("event_id"),
          col("j.k").as("k"), col("j.t").as("t"),
          col("j._corrupt").as("corrupt"),
          col("j._corrupt").isNotNull.cast("int").as("is_corrupt"))
    }),

    // F12 + F13: md5 digest and char-class strip
    // (reference wbi.py:26-32).
    "f12_md5_translate" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .where(col("c_custkey") < 2000)
        .select(col("c_custkey"),
          md5(col("c_name")).as("digest"),
          translate(col("c_name"), "#0", "").as("stripped"))
    }),

    // F14: the WBI mixin-key shuffle (reference wbi.py:8-17) — the
    // LAST in-scope §2 row: chars of the 64-char concatenated key
    // picked at the fixed index table's first 32 positions. A pure
    // projection (32 substrings + concat, all codegen'd); the 64-char
    // input is derived per-row as md5(key)||md5(comment) so both
    // engines build the identical fixture.
    "f14_mixin_key" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .where(col("o_orderkey") < 5000)
        .select(col("o_orderkey"),
          mixinKey(concat(md5(col("o_orderkey").cast("string")),
            md5(col("o_orderpriority")))).as("mixin_key"))
    })
  )

  /** `getMixinKey` (reference wbi.py:8-17): the fixed 64-entry index
    * table, of which only the first 32 survive the `[:32]` truncation.
    */
  private val mixinTab = Seq(
    46, 47, 18, 2, 53, 8, 23, 32, 15, 50, 10, 31, 58, 3, 45, 35,
    27, 43, 5, 49, 33, 9, 42, 19, 29, 28, 14, 39, 12, 38, 41, 13)

  /** Column spelling of the mixin shuffle: `concat` of one-char
    * `substring`s at the table's (1-based) positions — Catalyst folds
    * this into a single codegen'd projection, no UDF.
    */
  def mixinKey(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(mixinTab.map(i => substring(key, i + 1, 1)): _*)

  def oracle: Map[String, String] = Map(
    "f1_regex_datetime" ->
      """WITH t AS (
           SELECT o_orderkey,
             concat(year(o_orderdate), '年', month(o_orderdate), '月',
                    day(o_orderdate), '日8点场直播') AS title
           FROM orders WHERE o_orderkey < 5000)
         SELECT o_orderkey, title,
           CAST(regexp_extract(title, '(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场', 1) AS INT) AS ey,
           CAST(regexp_extract(title, '(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场', 2) AS INT) AS em,
           CAST(regexp_extract(title, '(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场', 3) AS INT) AS ed
         FROM t
         WHERE regexp_extract(title, '(\d{4})年(\d{1,2})月(\d{1,2})日(\d{1,2})点场', 1) <> ''""",
    "f2_first_pattern" ->
      """SELECT p_partkey,
           coalesce(nullif(regexp_extract(p_name, '(widget)', 1), ''),
                    nullif(regexp_extract(p_name, '(bolt)', 1), ''),
                    nullif(regexp_extract(p_name, '(gear)', 1), ''),
                    'other') AS kind
         FROM part""",
    "f3_tz_date_parts" ->
      """SELECT year(ts + INTERVAL 8 HOUR) AS y,
                month(ts + INTERVAL 8 HOUR) AS m,
                day(ts + INTERVAL 8 HOUR) AS d,
                COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2, 3""",
    "f4_strftime" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d_%H-%M-%S') AS stamp
         FROM orders WHERE o_orderkey < 1000""",
    "f5_seconds_hms" ->
      """SELECT event_id,
           printf('%02d:%02d:%02d', (event_id % 90000) // 3600,
                  ((event_id % 90000) % 3600) // 60, (event_id % 90000) % 60) AS hms
         FROM events WHERE event_id < 2000""",
    "f6_key_construction" ->
      """SELECT event_id,
           concat('audio/', user_id, '/',
                  year(ts + INTERVAL 8 HOUR), '/',
                  lpad(CAST(month(ts + INTERVAL 8 HOUR) AS VARCHAR), 2, '0'), '/',
                  lpad(CAST(day(ts + INTERVAL 8 HOUR) AS VARCHAR), 2, '0'), '/',
                  event_id, '.mp4') AS key
         FROM events""",
    "f7_string_ops" ->
      """SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           array_to_string(string_split(text, ' ')[1:3], '_') AS first3,
           string_split(text, ' ')[1] AS first_tok,
           string_split(text, ' ')[-1] AS last_tok
         FROM documents WHERE starts_with(text, 'the ')""",
    "f11_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1""",
    "f11_variant" ->
      """WITH j AS (
           SELECT event_id,
             '{"id":' || event_id || ',"type":"' || event_type || '","k":' ||
             json_extract_string(props, '$.k') || ',"tags":["t",' ||
             (event_id % 7) || '],"meta":{"d":' || (user_id % 5) || '}}' AS payload
           FROM events WHERE event_id % 97 = 0)
         SELECT event_id,
           CAST(json_extract(payload, '$.id') AS BIGINT) AS vid,
           json_extract_string(payload, '$.type') AS vtype,
           CAST(json_extract(payload, '$.k') AS BIGINT) AS vk,
           CAST(json_extract(payload, '$.tags[1]') AS BIGINT) AS vtag,
           CAST(json_extract(payload, '$.meta.d') AS BIGINT) AS vmeta
         FROM j""",
    "f11_variant_hetero" ->
      """WITH j AS (
           SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN
               '{"id":' || event_id || ',"x":' || (user_id % 1000) ||
               ',"extra":"' || event_type || '"}'
             WHEN event_id % 3 = 1 THEN
               '{"id":' || event_id || ',"x":"s' || (user_id % 1000) || '"}'
             ELSE '{"id":' || event_id || ',"note":"n"}' END AS payload
           FROM events WHERE event_id % 89 = 0)
         SELECT event_id,
           CAST(json_extract(payload, '$.id') AS BIGINT) AS vid,
           TRY_CAST(json_extract_string(payload, '$.x') AS BIGINT) AS x_long,
           json_extract_string(payload, '$.x') AS x_str,
           json_extract_string(payload, '$.extra') AS extra
         FROM j""",
    "f11_json_malformed" ->
      """WITH g AS (
           SELECT event_id,
             '{"k":' || json_extract_string(props, '$.k') || ',"t":"' ||
             event_type || '"}' AS good
           FROM events WHERE event_id % 7 = 0),
         t AS (
           SELECT event_id,
             CASE WHEN event_id % 13 = 0 THEN substr(good, 1, length(good) - 1)
                  WHEN event_id % 17 = 0 THEN 'not json'
                  ELSE good END AS payload
           FROM g)
         SELECT event_id,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract(payload, '$.k') AS BIGINT) END AS k,
           CASE WHEN json_valid(payload)
                THEN json_extract_string(payload, '$.t') END AS t,
           CASE WHEN NOT json_valid(payload) THEN payload END AS corrupt,
           CAST(coalesce(NOT json_valid(payload), FALSE) AS INT) AS is_corrupt
         FROM t""",
    "f12_md5_translate" ->
      """SELECT c_custkey, md5(c_name) AS digest,
           translate(c_name, '#0', '') AS stripped
         FROM customer WHERE c_custkey < 2000""",
    // the same fixed index table, 1-based in DuckDB's substr
    "f14_mixin_key" ->
      """SELECT o_orderkey,
           array_to_string(
             [substr(md5(CAST(o_orderkey AS VARCHAR)) || md5(o_orderpriority),
                     i + 1, 1)
              for i in [46, 47, 18, 2, 53, 8, 23, 32, 15, 50, 10, 31,
                        58, 3, 45, 35, 27, 43, 5, 49, 33, 9, 42, 19,
                        29, 28, 14, 39, 12, 38, 41, 13]], '') AS mixin_key
         FROM orders WHERE o_orderkey < 5000"""
  )
}
