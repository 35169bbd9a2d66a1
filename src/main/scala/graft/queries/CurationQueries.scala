package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.CurationFilters

/** Round-11 curation-recipe queries: the published rule-based web-corpus
  * filters (Gopher, C4) and the weighted / distribution-matched sampling
  * family, each with a hash-exact DuckDB oracle. Split out of
  * [[ExtQueries]] (3k lines) along the module seams.
  */
object CurationQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher rule-set quality gate (Rae et al. 2021 App. A): corpus ∪
    // planted branch-coverage pages, every rule measured and the keep
    // verdict decided on integer cross-multiplied fractions. Map-only.
    "q_gopher_filter" -> ((s, d) => {
      val in = CurationFilters.withPlanted(
        s, Tables.documents(s, d), CurationFilters.gopherPlanted)
      CurationFilters.gopherFrame(in, "text").orderBy(col("doc_id"))
    }),

    // C4 line-level filter (Raffel et al. 2020 §2.2): terminal-punct +
    // ≥5-word lines survive, ≥3 surviving lines keep the page, lorem
    // ipsum / brace pages drop; retained text pinned by md5. Map-only.
    "q_c4_filter" -> ((s, d) => {
      val in = CurationFilters.withPlanted(
        s, Tables.documents(s, d), CurationFilters.c4Planted)
      CurationFilters.c4Frame(in, "text").orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q_gopher_filter" ->
      s"""WITH rel AS (
         |  ${CurationFilters.plantedRelSql(CurationFilters.gopherPlanted)}),
         |res AS (
         |${CurationFilters.gopherSql("rel")})
         |SELECT * FROM res ORDER BY doc_id""".stripMargin,

    "q_c4_filter" ->
      s"""WITH rel AS (
         |  ${CurationFilters.plantedRelSql(CurationFilters.c4Planted)}),
         |res AS (
         |${CurationFilters.c4Sql("rel")})
         |SELECT * FROM res ORDER BY doc_id""".stripMargin
  )
}
