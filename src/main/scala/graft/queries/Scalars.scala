package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Group R — scalar function coverage: strings, date/math, array ops.
  * Everything stays inside whole-stage codegen (functions._ only).
  */
object Scalars extends QueryModule {

  /** String functions over part. */
  private val scalarString = Q(
    "r_scalar_string",
    Some("""SELECT p_partkey,
            upper(substring(p_name, 1, 8)) AS name8,
            CAST(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS BIGINT) AS is_widget,
            regexp_extract(p_name, '^(\w+)', 1) AS first_word,
            CAST(length(p_name) AS BIGINT) AS name_len,
            concat(p_brand, ':', p_type) AS brand_type
            FROM part WHERE p_size > 30 ORDER BY p_partkey"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "part")
        .where($"p_size" > 30)
        .select($"p_partkey",
          upper(substring($"p_name", 1, 8)).as("name8"),
          when($"p_name".like("%widget%"), 1L).otherwise(0L).as("is_widget"),
          regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
          length($"p_name").cast("long").as("name_len"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    })

  /** Date arithmetic + math functions over orders. sqrt is IEEE
    * correctly-rounded (unlike pow), so both engines agree bitwise. */
  private val scalarDatemath = Q(
    "r_scalar_datemath",
    Some("""SELECT o_orderkey,
            strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
            CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT)
              AS days_to_1999,
            round(sqrt(o_totalprice), 4) AS sqrt_price,
            round(abs(o_totalprice - 250000.0), 2) AS abs_diff,
            CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS yyyymm
            FROM orders WHERE o_totalprice > 400000 ORDER BY o_orderkey"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "orders")
        .where($"o_totalprice" > 400000)
        .select($"o_orderkey",
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("order_month"),
          datediff(lit("1999-01-01").cast("date"), $"o_orderdate".cast("date"))
            .cast("long").as("days_to_1999"),
          round(sqrt($"o_totalprice"), 4).as("sqrt_price"),
          round(abs($"o_totalprice" - 250000.0), 2).as("abs_diff"),
          (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long").as("yyyymm"))
        .orderBy($"o_orderkey")
    })

  /** Array ops: split p_name into words, explode, count occurrences.
    * Also exercises size/array_contains on the per-part row. */
  private val scalarArrayMap = Q(
    "r_scalar_array_map",
    Some("""WITH w AS (SELECT p_partkey,
                         string_split(p_name, ' ') AS words,
                         unnest(string_split(p_name, ' ')) AS word
                       FROM part)
            SELECT word, count(*) AS n,
              CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
              CAST(sum(len(words)) AS BIGINT) AS sum_words
            FROM w WHERE word <> '' GROUP BY word ORDER BY word"""),
    (spark, dir) => {
      import spark.implicits._
      t(spark, dir, "part")
        .select($"p_partkey", split($"p_name", " ").as("words"))
        .select($"p_partkey", $"words", explode($"words").as("word"))
        .where($"word" =!= "")
        .groupBy($"word")
        .agg(count(lit(1)).as("n"),
          countDistinct($"p_partkey").as("n_parts"),
          sum(size($"words")).cast("long").as("sum_words"))
        .orderBy($"word")
    })

  override def all: Seq[Q] = Seq(scalarString, scalarDatemath, scalarArrayMap)
}
