package graft.functions

import graft.{Parity, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY.md §2.8) — everything is a Spark
  * built-in (codegen'd, stays inside WholeStageCodegen; zero UDFs by
  * design so Catalyst can optimize and DuckDB can mirror).
  *
  * Lineage: date conversions re-express
  * `/root/reference/src/util.rs:2-15` (epoch→date, "%Y-%m-%d"→date);
  * JSON access generalizes the reference's serde JSON deserialization
  * (`/root/reference/src/extract/fs.rs:6-13`) over `events.props`.
  *
  * Float-parity notes: sqrt is IEEE-correctly-rounded (bitwise equal
  * across engines); single mul/sub/div on doubles is exact-deterministic;
  * ln differs in ulps across libm impls → rounded to 6 digits.
  */
object ScalarQueries {
  import Tables._

  private def fnString(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
        size(split(col("p_name"), " ")).cast(LongType).as("n_tokens"),
        regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_word"),
        col("p_name").like("%a%").as("has_a"))
      .orderBy(col("p_partkey"))

  /** Epoch→date is `util::convert_date_from_epoch`
    * (`/root/reference/src/util.rs:2-6`); string parse is
    * `convert_date_from_string` (`:9-15`). */
  private def fnDate(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).cast(LongType).as("days_to"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("plus30"),
        date_format(to_date(from_unixtime(col("o_orderkey") * 86400)), "yyyy-MM-dd").as("epoch_date"))
      .orderBy(col("o_orderkey"))

  private def fnMath(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Parity.r1(col("l_extendedprice")).as("r1"),
        floor(col("l_extendedprice")).cast(LongType).as("fl"),
        ceil(col("l_extendedprice")).cast(LongType).as("ce"),
        abs(col("l_discount") - lit(0.05)).as("adiff"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("sq"),
        Parity.r6(log(col("l_extendedprice"))).as("lnp"),
        (col("l_partkey") % 7).as("m7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private def fnArray(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        array_contains(toks, "data").as("has_data"),
        concat_ws(",", slice(array_sort(array_distinct(toks)), 1, 5)).as("first5_distinct"),
        aggregate(transform(toks, x => length(x).cast(LongType)), lit(0L), (a, x) => a + x)
          .as("total_len"),
        size(filter(toks, x => length(x) > 4)).cast(LongType).as("n_long"))
      .orderBy(col("doc_id"))
  }

  private def fnMapJson(spark: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"), MapType(StringType, LongType))
    graft.Tables.fanout(events(spark, dir)) // JSON parsing is CPU-bound per row
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_get"),
        element_at(parsed, "k").as("k_map"),
        concat_ws(",", map_keys(parsed)).as("keys"))
      .orderBy(col("event_id"))
  }

  /** Extended string family: edit distance, casing, padding, search —
    * all integer/string-exact cross-engine. */
  private def fnStringExtra(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).cast(LongType).as("lev"),
        concat(upper(expr("substr(p_name, 1, 1)")), expr("substr(p_name, 2)")).as("title"),
        reverse(col("p_brand")).as("rev"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        repeat(col("p_brand"), 2).as("doubled"),
        regexp_replace(col("p_name"), "a", "@").as("replaced"),
        instr(col("p_name"), "a").cast(LongType).as("first_a"))
      .orderBy(col("p_partkey"))

  /** Struct + map construction and access — nested values built and
    * consumed in-plan (outputs flattened for canonical comparison). */
  private def fnStructMap(spark: SparkSession, dir: String): DataFrame = {
    val st = struct(col("n_name").as("name"), col("n_regionkey").as("rk"))
    val mp = map(lit("name"), col("n_name"), lit("key"), col("n_nationkey").cast(StringType))
    nation(spark, dir)
      .select(col("n_nationkey"),
        st.getField("name").as("s_name"),
        (st.getField("rk") + 100).cast(LongType).as("s_rk_plus"),
        element_at(mp, "name").as("m_name"),
        size(map_values(mp)).cast(LongType).as("m_size"))
      .orderBy(col("n_nationkey"))
  }

  /** Hash + bitwise family (md5/sha256 are cross-engine; xxhash64 is
    * Spark-only and lives in the no-oracle dedup ops). */
  private def fnHashBitwise(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .select(
        col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"),
        shiftleft(col("p_partkey"), 3).as("shl3"),
        shiftright(col("p_partkey"), 2).as("shr2"),
        col("p_partkey").bitwiseAND(lit(255L)).as("and255"),
        col("p_partkey").bitwiseOR(lit(4096L)).as("or4096"))
      .orderBy(col("p_partkey"))

  private def fnConditional(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_bucket"),
        when(col("c_acctbal") > 0, "pos").otherwise("nonpos").as("sign"))
      .orderBy(col("c_custkey"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("fn_string", Some(
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        | substr(p_name, 1, 5) AS sub,
        | trim(concat('  ', p_name, '  ')) AS trimmed,
        | concat_ws('-', p_brand, p_type) AS joined,
        | CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
        | regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
        | (p_name LIKE '%a%') AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin), fnString),

    QueryDef("fn_date", Some(
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(day(o_orderdate) AS BIGINT) AS d,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to,
        | strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | strftime(CAST(epoch_ms(o_orderkey * 86400 * 1000) AS DATE), '%Y-%m-%d') AS epoch_date
        |FROM orders ORDER BY o_orderkey""".stripMargin), fnDate),

    QueryDef("fn_math", Some(
      """SELECT l_orderkey, l_linenumber,
        | floor(l_extendedprice * 10 + 0.5) / 10 AS r1,
        | CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        | abs(l_discount - 0.05) AS adiff,
        | l_quantity * l_quantity AS qty_sq,
        | sqrt(l_extendedprice) AS sq,
        | floor(ln(l_extendedprice) * 1000000 + 0.5) / 1000000 AS lnp,
        | l_partkey % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin), fnMath),

    QueryDef("fn_array", Some(
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | list_contains(string_split(text, ' '), 'data') AS has_data,
        | array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5_distinct,
        | CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_len,
        | CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS BIGINT) AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin), fnArray),

    QueryDef("fn_map_json", Some(
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_get,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map,
        | array_to_string(json_keys(props), ',') AS keys
        |FROM events ORDER BY event_id""".stripMargin), fnMapJson),

    QueryDef("fn_string_extra", Some(
      """SELECT p_partkey,
        | CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
        | upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS title,
        | reverse(p_brand) AS rev,
        | lpad(p_brand, 12, '*') AS padded,
        | repeat(p_brand, 2) AS doubled,
        | regexp_replace(p_name, 'a', '@', 'g') AS replaced,
        | CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin), fnStringExtra),

    QueryDef("fn_struct_map", Some(
      """SELECT n_nationkey,
        | struct_extract({'name': n_name, 'rk': n_regionkey}, 'name') AS s_name,
        | CAST(struct_extract({'name': n_name, 'rk': n_regionkey}, 'rk') + 100 AS BIGINT) AS s_rk_plus,
        | (map(['name', 'key'], [n_name, CAST(n_nationkey AS VARCHAR)])['name'])[1] AS m_name,
        | CAST(len(map_values(map(['name', 'key'], [n_name, CAST(n_nationkey AS VARCHAR)]))) AS BIGINT) AS m_size
        |FROM nation ORDER BY n_nationkey""".stripMargin), fnStructMap),

    QueryDef("fn_hash_bitwise", Some(
      """SELECT p_partkey,
        | md5(p_name) AS h_md5,
        | sha256(p_name) AS h_sha256,
        | p_partkey << 3 AS shl3,
        | p_partkey >> 2 AS shr2,
        | p_partkey & 255 AS and255,
        | p_partkey | 4096 AS or4096
        |FROM part ORDER BY p_partkey""".stripMargin), fnHashBitwise),

    QueryDef("fn_conditional", Some(
      """SELECT c_custkey,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg,
        | CASE WHEN c_acctbal < 0 THEN 'neg'
        |      WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket,
        | CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS sign
        |FROM customer ORDER BY c_custkey""".stripMargin), fnConditional),

    QueryDef("fn_regex", Some(
      """SELECT doc_id,
        | regexp_extract(text, '[a-z]+') AS first_word,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
        | regexp_matches(text, 'data') AS has_data,
        | regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
        | array_to_string(string_split_regex(text, '[^a-zA-Z0-9]+')[1:4], ',') AS first4_tokens
        |FROM documents ORDER BY doc_id""".stripMargin), fnRegex)
  )

  /** Regex family — extraction, global match count, boolean match,
    * global replace, and regex split. Patterns are kept inside the
    * RE2 ∩ java.util.regex common dialect (char classes, +), so both
    * engines compile them identically; Spark's regexp_replace is
    * global by default where DuckDB needs the 'g' flag. All codegen'd
    * built-ins — stays in WholeStageCodegen. Fanned out: five regex
    * passes over full document text are CPU-bound, and the corpus
    * arrives as one parquet split — without the repartition the whole
    * pass pins to a single core (benched 0.7–3.8 s swings at sf0.1;
    * the other per-row text ops already fan out for the same reason). */
  private def fnRegex(spark: SparkSession, dir: String): DataFrame =
    fanout(documents(spark, dir))
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "[a-z]+", 0).as("first_word"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .cast(LongType).as("n_words"),
        col("text").rlike("data").as("has_data"),
        regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
        concat_ws(",", slice(split(col("text"), "[^a-zA-Z0-9]+"), 1, 4))
          .as("first4_tokens"))
      .orderBy(col("doc_id"))
}
