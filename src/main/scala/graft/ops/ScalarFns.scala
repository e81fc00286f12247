package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar functions: string / date / math / conditional / array / json, plus
  * the explode generator and a Scala UDF (SURVEY.md §2B "Scalar functions").
  * Everything stays inside whole-stage codegen except the one deliberate UDF
  * row (`udf_scalar`), which exists to demonstrate the extension point.
  */
object ScalarFns {
  import Tables._

  /** Text normalization: trim, lowercase, collapse whitespace runs. Same
    * contract as `dedup_exact`'s native regexp pipeline — the two are
    * separate implementations (UDF here, codegen'd functions there) and
    * BOTH are pinned to the same SQL expression by their oracles, which is
    * what keeps them from drifting.
    */
  val normalizeText: String => String =
    s => if (s == null) null else s.trim.toLowerCase.replaceAll("\\s+", " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        length(col("p_name")).cast("long").as("len"),
        lpad(col("p_size").cast("string"), 4, "0").as("pad"),
        regexp_replace(col("p_type"), " ", "_").as("rep"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"))
        .orderBy("p_partkey")),

    // the URL function family: parse_url component extraction (protocol,
    // host, path, query, fragment) plus keyed query-param lookup — the
    // log-enrichment primitive clickstream pipelines run per row. URLs
    // are synthesized from order columns (the dedup_url_norm pattern) so
    // the op is self-contained; components stay lowercase and '#'-free
    // except the deliberate fragment, so Spark's parse_url and the
    // oracle's per-part regexes agree on every row.
    "fn_url" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("url", concat(
          lit("https://www.shop-"), pmod(col("o_custkey"), lit(7)),
          lit(".example.com/orders/"), col("o_orderkey"),
          lit("?status="), col("o_orderstatus"),
          lit("&id="), pmod(col("o_orderkey"), lit(97)),
          lit("#s"), pmod(col("o_orderkey"), lit(5))))
        .select(
          col("o_orderkey"),
          expr("parse_url(url, 'PROTOCOL')").as("protocol"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'REF')").as("fragment"),
          expr("parse_url(url, 'QUERY', 'id')").as("id_param"))
        .orderBy("o_orderkey")),

    // the regex function family beyond plain replace: group extraction,
    // match counting, boolean match, group-referencing replacement. All
    // patterns stay RE2-compatible (no backreferences, no lookaround) so
    // DuckDB's regex engine agrees with the JVM's on every row — the same
    // constraint text_pii_scrub documents.
    "fn_regexp" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "^(\\w+) (\\w+)", 2).as("second_word"),
        size(expr("regexp_extract_all(text, '\\\\btable\\\\b', 0)"))
          .cast("long").as("n_table"),
        col("text").rlike("spark").as("mentions_spark"),
        regexp_extract(col("text"), "(\\w+) merge", 1).as("before_merge"),
        regexp_replace(substring(col("text"), 1, 60), "(key|row)", "[$1]")
          .as("tagged"))
        .orderBy("doc_id")),

    "fn_date" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        datediff(col("o_orderdate"), to_timestamp(lit("1995-01-01 00:00:00")))
          .cast("long").as("days_since"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus3d"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") / 3, 6).as("third"),
        floor(col("l_extendedprice")).cast("long").as("flr"),
        ceil(col("l_extendedprice")).cast("long").as("cl"),
        abs(col("l_quantity") - 25).as("dev"),
        sqrt(col("l_quantity")).as("rt"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(pow(col("l_discount"), 2), 6).as("sq"),
        (col("l_orderkey") % 7).as("m7"))
        // (okey, linenumber) is not unique — order by enough outputs to make
        // ties identical tuples ("third" determines every price-derived col;
        // "rt"/"dev" the quantity-derived ones)
        .orderBy("l_orderkey", "l_linenumber", "third", "rt", "sq")),

    // null-safe comparison semantics over REAL nulls (the left join leaves
    // customers without big-ticket orders with a null o_orderkey): <=> vs
    // =, null-propagating arithmetic, and null-aware counts
    "fn_nullsafe" -> { (s, d) =>
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"), col("o_orderkey"),
          (col("o_orderkey") <=> col("o_custkey")).as("eq_nullsafe"),
          (col("o_orderkey") === col("o_custkey")).as("eq_plain"),
          col("o_orderkey").isNull.as("no_big_order"),
          (col("o_totalprice") * 2).as("doubled"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // transcendentals rounded to 6 decimals: JVM Math and C libm agree far
    // beyond 1e-6, so rounding makes cross-engine FP parity a non-issue
    "fn_trig" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(sin(col("l_quantity")), 6).as("sn"),
        round(cos(col("l_quantity")), 6).as("cs"),
        round(tan(col("l_discount")), 6).as("tn"),
        round(atan2(col("l_quantity"), col("l_extendedprice")), 6).as("at2"),
        round(exp(col("l_discount")), 6).as("ex"),
        round(degrees(atan(col("l_tax"))), 6).as("deg"))
        // (okey, linenumber) is not unique — order by all output columns
        .orderBy("l_orderkey", "l_linenumber", "sn", "cs", "tn", "at2",
          "ex", "deg")),

    "fn_cond" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<none>"))
          .as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"))
        .orderBy("c_custkey")),

    // error-safe function family: try_cast returns NULL on a failed parse
    // (priority strings don't parse; their leading digit does) and
    // try_divide returns NULL on division by zero — the ANSI-mode-safe
    // forms an ingest pipeline uses so one malformed row can't fail a
    // 100 TB job. Pure projection; oracle uses TRY_CAST + a nullif guard.
    "fn_try" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        expr("TRY_CAST(o_orderpriority AS INT)").as("bad_cast"),
        expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)")
          .as("prio_num"),
        expr("""try_divide(CAST(o_totalprice AS DOUBLE),
                |CAST(o_orderkey % 3 AS DOUBLE))""".stripMargin)
          .as("div3"))
        .orderBy("o_orderkey")),

    // higher-order array functions over the embedding vectors; the fold in
    // `aggregate` is a sequential left fold => bit-identical to DuckDB's
    // list_aggregate sum
    "fn_array" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dim"),
          round(expr(
            "aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 6)
            .as("total"),
          round(expr(
            "aggregate(slice(v, 1, 5), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"),
            6).as("head5"),
          round(array_max(col("v")), 6).as("mx"),
          round(array_min(col("v")), 6).as("mn"))
        .orderBy("vec_id")),

    // the higher-order lambda family fn_array doesn't reach: zip_with
    // (pairwise combine), filter (predicate projection), forall/exists
    // (quantifiers). All run IN the row inside codegen — the reason to
    // prefer them over explode+groupBy for per-array math (no shuffle,
    // no row explosion). Left-fold accumulation order is the array
    // order on both engines, so the zip_with dot product is
    // bit-deterministic before the final round.
    "fn_lambda" -> ((s, d) =>
      t(s, d, "embeddings")
        .filter(col("vec_id") < 200)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select(col("vec_id"),
          round(expr(
            "aggregate(zip_with(v, reverse(v), (a, b) -> a * b), " +
              "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 6).as("dot_rev"),
          size(expr("filter(v, x -> x > 0)")).cast("long").as("n_pos"),
          expr("forall(v, x -> abs(x) <= 1.0)").as("bounded"),
          expr("exists(v, x -> x > 0.5)").as("has_big"))
        .orderBy("vec_id")),

    "fn_explode" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
        .orderBy("doc_id", "pos")),

    "fn_json" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Spark 4 VARIANT: parse once into the binary semi-structured type,
    // extract typed paths downstream — the open-schema ingestion pattern
    // (vs per-path get_json_object re-parses of the same string). The
    // variant column itself never reaches the output (not hashable by the
    // checker); its typed extractions do.
    "fn_variant" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("k")), 6).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // nested struct round-trip: build the struct, prove it survives parquet
    // storage, then project its fields BACK to scalar columns. Raw struct
    // (like raw map — SURVEY §7.4) never reaches the output: the driver's
    // pandas checker can't sort/hash nested python dicts.
    "fn_struct" -> { (s, d) =>
      val out = scratch("fn_struct", d)
      t(s, d, "documents")
        .select(col("doc_id"),
          struct(col("lang").as("lang"), col("n_chars").as("n"),
            col("source").as("src")).as("meta"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .select(col("doc_id"),
          col("meta.lang").as("lang"),
          col("meta.n").cast("long").as("n"),
          col("meta.src").as("src"))
        .orderBy("doc_id")
    },

    // bitwise ops (Spark SQL ^ is xor; DuckDB ^ is power, its xor is xor())
    "fn_bitwise" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        expr("event_id & 255").as("band"),
        expr("event_id | 4096").as("bor"),
        expr("event_id ^ user_id").as("bxor"),
        expr("shiftleft(user_id, 3)").as("shl"),
        expr("shiftright(event_id, 2)").as("shr"),
        expr("CAST(bit_count(event_id) AS BIGINT)").as("bits"))
        .orderBy("event_id")),

    // MapType construction + lookup (DuckDB element_at returns a 1-list;
    // the oracle unwraps with [1]). Maps never appear in output columns
    // (unordered stringification — SURVEY §7.4); only extracted scalars do.
    "fn_map" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        element_at(map_from_arrays(
          array(lit("eid"), lit("uid")),
          array(col("event_id"), col("user_id"))), "uid").as("uid"),
        size(map_from_arrays(array(lit("a"), lit("b")),
          array(lit(1L), lit(2L)))).cast("long").as("n_keys"))
        .orderBy("event_id")),

    "udf_scalar" -> { (s, d) =>
      val norm = udf(normalizeText)
      t(s, d, "documents").select(
        col("doc_id"),
        length(norm(col("text"))).cast("long").as("norm_len"),
        substring(norm(col("text")), 1, 40).as("norm_prefix"))
        .orderBy("doc_id")
    }
  )

  def oracle: Map[String, String] = Map(
    // identical URL synthesis; each component re-derived by its own
    // anchored regex (DuckDB has no parse_url) — the extraction grammar
    // matches java.net's component split on these '#'-clean inputs
    "fn_url" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |    'https://www.shop-' || (o_custkey % 7)
        |    || '.example.com/orders/' || o_orderkey
        |    || '?status=' || o_orderstatus
        |    || '&id=' || (o_orderkey % 97)
        |    || '#s' || (o_orderkey % 5) AS url
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
        |  regexp_extract(url, '^[a-z]+://([^/?#]*)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '#(.*)$', 1) AS fragment,
        |  regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
        |FROM u ORDER BY o_orderkey""".stripMargin,

    "fn_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^(\w+) (\w+)', 2) AS second_word,
        |  CAST(len(regexp_extract_all(text, '\btable\b')) AS BIGINT)
        |    AS n_table,
        |  regexp_matches(text, 'spark') AS mentions_spark,
        |  regexp_extract(text, '(\w+) merge', 1) AS before_merge,
        |  regexp_replace(substring(text, 1, 60), '(key|row)', '[\1]', 'g')
        |    AS tagged
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |substring(p_name, 1, 5) AS sub, length(p_name) AS len,
        |lpad(CAST(p_size AS VARCHAR), 4, '0') AS pad,
        |regexp_replace(p_type, ' ', '_', 'g') AS rep,
        |string_split(p_name, ' ')[1] AS first_word,
        |regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |p_brand || '#' || p_type AS cat
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(day(o_orderdate) AS BIGINT) AS dom,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
        |  AS days_since,
        |o_orderdate + INTERVAL 3 DAY AS plus3d,
        |CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |round(l_extendedprice / 3, 6) AS third,
        |CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        |abs(l_quantity - 25) AS dev,
        |sqrt(l_quantity) AS rt,
        |round(ln(l_extendedprice), 6) AS lg,
        |round(power(l_discount, 2), 6) AS sq,
        |l_orderkey % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, third, rt, sq"""
        .stripMargin,
    "fn_nullsafe" ->
      """SELECT c_custkey, o_orderkey,
        |o_orderkey IS NOT DISTINCT FROM o_custkey AS eq_nullsafe,
        |o_orderkey = o_custkey AS eq_plain,
        |o_orderkey IS NULL AS no_big_order,
        |o_totalprice * 2 AS doubled
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |           WHERE o_totalprice > 300000) b
        |  ON c_custkey = b.o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "fn_trig" ->
      """SELECT l_orderkey, l_linenumber,
        |round(sin(l_quantity), 6) AS sn,
        |round(cos(l_quantity), 6) AS cs,
        |round(tan(l_discount), 6) AS tn,
        |round(atan2(l_quantity, l_extendedprice), 6) AS at2,
        |round(exp(l_discount), 6) AS ex,
        |round(degrees(atan(l_tax)), 6) AS deg
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, sn, cs, tn, at2, ex, deg"""
        .stripMargin,
    "fn_try" ->
      """SELECT o_orderkey,
        |TRY_CAST(o_orderpriority AS INT) AS bad_cast,
        |TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
        |CAST(o_totalprice AS DOUBLE)
        |  / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS div3
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_cond" ->
      """SELECT c_custkey,
        |coalesce(nullif(c_mktsegment, 'BUILDING'), '<none>') AS seg,
        |greatest(c_acctbal, 0.0) AS bal_floor,
        |least(c_acctbal, 1000.0) AS bal_cap
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """SELECT vec_id,
        |len(v) AS n_dim,
        |round(list_aggregate(v, 'sum'), 6) AS total,
        |round(list_aggregate(list_slice(v, 1, 5), 'sum'), 6) AS head5,
        |round(list_max(v), 6) AS mx,
        |round(list_min(v), 6) AS mn
        |FROM (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings) e
        |ORDER BY vec_id""".stripMargin,
    // DuckDB spells the quantifiers as list_bool_and/or over a
    // transformed boolean list; the zip_with fold is list_zip +
    // list_reduce with a prepended 0 seed — same element order, same
    // left fold, same doubles
    "fn_lambda" ->
      """SELECT vec_id,
        |round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |  list_transform(list_zip(v, list_reverse(v)),
        |    p -> p[1] * p[2])), (acc, x) -> acc + x), 6) AS dot_rev,
        |CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
        |list_bool_and(list_transform(v, x -> abs(x) <= 1.0)) AS bounded,
        |list_bool_or(list_transform(v, x -> x > 0.5)) AS has_big
        |FROM (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 200) e
        |ORDER BY vec_id""".stripMargin,
    "fn_explode" ->
      """SELECT doc_id,
        |CAST(generate_subscripts(w, 1) - 1 AS BIGINT) AS pos,
        |unnest(w) AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents WHERE doc_id < 20) d
        |ORDER BY doc_id, pos""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_variant" ->
      """SELECT event_type, count(*) AS cnt,
        |round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
        |  AS avg_k,
        |CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |  AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_struct" ->
      """SELECT doc_id, m.lang AS lang, CAST(m.n AS BIGINT) AS n,
        |m.src AS src
        |FROM (SELECT doc_id,
        |  struct_pack(lang := lang, n := n_chars, src := source) AS m
        |  FROM documents) d
        |ORDER BY doc_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |event_id & 255 AS band,
        |event_id | 4096 AS bor,
        |xor(event_id, user_id) AS bxor,
        |user_id << 3 AS shl,
        |event_id >> 2 AS shr,
        |CAST(bit_count(event_id) AS BIGINT) AS bits
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |element_at(MAP {'eid': event_id, 'uid': user_id}, 'uid')[1] AS uid,
        |CAST(cardinality(MAP {'a': 1, 'b': 2}) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "udf_scalar" ->
      """SELECT doc_id,
        |length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |  AS norm_len,
        |substring(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40)
        |  AS norm_prefix
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
