package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function families beyond the reference's F1-F8 rows
  * (SURVEY.md §2.8 marks everything past casts/LIKE/JSON "ABSENT" in
  * the reference — this is the engine-side completion of that table):
  * date/time arithmetic, string manipulation, math. Every column is a
  * codegen'd built-in; outputs are formatted/rounded to be engine-
  * portable (dayofweek conventions, libm ULP differences).
  */
object FunctionSuites {

  // --- F-DATE: date/time arithmetic family over order dates. ---
  def dateSuite(s: SparkSession, d: String): DataFrame = {
    val dt = to_date(col("o_orderdate"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        date_format(date_add(dt, 30), "yyyy-MM-dd").as("plus_30d"),
        date_format(add_months(dt, 2), "yyyy-MM-dd").as("plus_2mo"),
        date_format(last_day(dt), "yyyy-MM-dd").as("month_end"),
        date_format(trunc(dt, "month"), "yyyy-MM-dd").as("month_start"),
        datediff(lit("1998-01-01").cast("date"), dt).as("days_to_98"),
        quarter(dt).as("q"),
        weekday(dt).as("wd"), // 0 = Monday in both engines' mapping below
        weekofyear(dt).as("iso_week"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")
  }

  // --- F-STR2: string-manipulation family over part names. ---
  def stringSuite2(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        reverse(col("p_name")).as("name_rev"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        instr(col("p_name"), "a").as("first_a"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        trim(lpad(col("p_type"), 10, " ")).as("type_trim"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"))
      .orderBy("p_partkey")

  // --- F-MATH: math family — 6dp rounding absorbs libm ULP
  // differences between engines. ---
  def mathSuite(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
        round(pow(col("p_size"), 2), 1).as("size_sq"),
        round(exp(col("p_size") / lit(50.0)), 6).as("exp_size"),
        round(log(col("p_retailprice") + 1), 6).as("ln_price"),
        round(log10(col("p_retailprice") + 1), 6).as("log10_price"),
        signum(col("p_size") - 25).cast("int").as("size_sign"),
        (col("p_partkey") % 7).as("key_mod7"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        greatest(col("p_size"), lit(25)).as("size_hi"),
        least(col("p_size"), lit(25)).as("size_lo"),
        round(sin(col("p_size") / lit(10.0)), 6).as("sin_size"),
        round(atan2(col("p_size"), col("p_retailprice")), 6).as("atan2_sp"))
      .orderBy("p_partkey")

  // --- F-MAP/STRUCT: complex-type construction and access — map
  // build/lookup/keys/size, struct field access, array-of-struct
  // extraction. The Spark side routes every value THROUGH the complex
  // type (map_from_arrays -> element_at, struct -> getField,
  // array(struct) -> transform); the oracle computes the same values
  // arithmetically, so the comparison proves the complex-type ops are
  // value-preserving without needing cross-engine map/struct literals.
  // All codegen'd built-ins, map-only. ---
  def mapStructSuite(s: SparkSession, d: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("base"), lit("double"), lit("triple")),
      array(col("p_size"), col("p_size") * 2, col("p_size") * 3))
    val st = struct(col("p_brand").as("brand"),
      struct(col("p_size").as("sz"), col("p_retailprice").as("price")).as("inner"))
    val arr = array(
      struct(lit(1).as("k"), col("p_size").as("v")),
      struct(lit(2).as("k"), (col("p_size") * 10).as("v")))
    Tables.part(s, d)
      .filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        element_at(m, "double").as("m_double"),
        size(m).cast("int").as("m_size"),
        array_join(map_keys(m), "|").as("m_keys"),
        map_contains_key(m, "triple").as("m_has_triple"),
        st.getField("inner").getField("sz").as("st_sz"),
        round(st.getField("inner").getField("price"), 2).as("st_price"),
        st.getField("brand").as("st_brand"),
        array_join(transform(arr, x =>
          (x.getField("k") * 100 + x.getField("v")).cast("string")), "|")
          .as("arr_kv"))
      .orderBy("p_partkey")
  }

  // --- F-BIT: bitwise family over the 64-bit key — AND/OR/XOR masks,
  // shifts, popcount, complement. Integer-exact in every engine; all
  // codegen'd built-ins (this is also the toolbox the SimHash/LSH ops
  // build on, exercised here in isolation). ---
  def bitwiseSuite(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("and_lo"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("or_hi"),
        col("o_orderkey").bitwiseXOR(lit(12345L)).as("xor_k"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        bit_count(col("o_orderkey")).as("popcnt"),
        bitwise_not(col("o_orderkey")).as("flipped"))
      .orderBy("o_orderkey")

  // --- F-CAST: cast-semantics family — the conversions every ingest
  // layer leans on, pinned where engine rules DIVERGE and must be
  // bridged explicitly in the oracle:
  //   * Spark (4.x, ANSI default) CAST(double AS INT) truncates toward
  //     zero; DuckDB's rounds — the oracle spells CAST(trunc(x) AS INT).
  //   * Malformed string→int ERRORS in both engines' plain CAST;
  //     try_cast (Spark) ≡ TRY_CAST (DuckDB) → NULL. The tolerant form
  //     is the one an ingest pipeline actually ships.
  // Valid numeric strings, bool→int, double→string agree plainly. ---
  def castSuite(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") < 2000)
      .select(col("p_partkey"),
        col("p_retailprice").cast("int").as("price_trunc"),
        (-col("p_retailprice")).cast("int").as("neg_trunc"),
        expr("try_cast(regexp_extract(p_name, '[0-9]+', 0) AS INT)")
          .as("name_num"),
        concat(lit(""), col("p_size").cast("string")).cast("int")
          .as("roundtrip_int"),
        (col("p_size") > 25).cast("int").as("big_flag"),
        col("p_size").cast("double").cast("string").as("size_str"))
      .orderBy("p_partkey")

  // --- F-REGEX: regular-expression family over document text —
  // extract / count / test / replace, the primitives every corpus
  // filter chain leans on. All four are codegen'd built-ins running
  // per-row (no shuffle); patterns avoid engine-specific syntax
  // (no lookaround, no named groups) so the oracle is portable. ---
  def regexSuite(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "\\bs[a-z]+", 0).as("first_s_word"),
        regexp_count(col("text"), lit("\\btable\\b")).cast("long").as("n_table"),
        col("text").rlike("hash join").cast("int").as("has_hash_join"),
        regexp_extract(col("text"), "\\b([a-z]{8,})\\b", 1).as("first_long_word"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("novowel_len"))
      .orderBy("doc_id")
}
