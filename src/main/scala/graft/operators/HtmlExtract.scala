package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction with boilerplate removal — the stage UPSTREAM of
  * every quality/dedup signal in a web-crawl pipeline (C4 and RefinedWeb
  * both start from extracted text; Boilerpipe/trafilatura is the classic
  * tooling). Two tiers, both pure `regexp_replace`/`replace` chains over
  * codegen'd string expressions — no UDF, engine-portable byte-for-byte:
  *
  *  - [[stripHtml]]: whole-document flatten — drop script/style/comment
  *    subtrees, strip remaining tags, decode the common entities, collapse
  *    whitespace. The "just give me the characters" baseline.
  *  - [[extractBlocks]]: Boilerpipe-lite main-content selection — segment
  *    on block-level tags, clean each block, and keep blocks with at least
  *    `minWords` words and link density ≤ 1/3 (navigation chrome, ads and
  *    link farms are short and/or anchor-dominated; body prose is neither
  *    — Kohlschütter et al. 2010's two strongest shallow features). The
  *    density test is the INTEGER comparison `3·link_words ≤ words`, so
  *    the whole decision replicates exactly in any engine.
  *
  * Order matters and is pinned: tags strip BEFORE entities decode, so text
  * that spells `&lt;b&gt;` decodes to a literal `<b>` in the OUTPUT rather
  * than being eaten as markup — the lossless behavior (decoding first
  * would turn escaped markup back into strippable tags).
  *
  * Scale shape: both tiers are narrow per-row maps in the scan stage —
  * zero shuffles for [[stripHtml]]; [[extractBlocks]] adds one posexplode
  * (bounded by blocks-per-doc) and a per-doc ordered reassembly window.
  * Payload strings never shuffle except doc_id-keyed block rows. */
object HtmlExtract {

  private val scriptPat = "(?is)<script\\b[^>]*>.*?</script>"
  private val stylePat = "(?is)<style\\b[^>]*>.*?</style>"
  private val commentPat = "(?s)<!--.*?-->"
  private val tagPat = "<[^>]+>"
  private val blockPat = "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|br|" +
    "section|article|header|footer|nav|blockquote)\\b[^>]*>"
  private val anchorPat = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Drop script/style/comment subtrees (content and all). */
  private def dropSubtrees(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      scriptPat, " "), stylePat, " "), commentPat, " ")

  /** Decode the common entities. `&amp;` decodes LAST so `&amp;lt;` comes
    * out as the literal `&lt;` (single-pass decode, never double). */
  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Tags → space, then entities, then whitespace collapse (see object
    * doc for why this order). */
  private def cleanFragment(c: Column): Column =
    collapseWs(decodeEntities(regexp_replace(c, tagPat, " ")))

  /** Whole-document text flatten: script/style/comments dropped, tags
    * stripped, entities decoded, whitespace collapsed. */
  def stripHtml(html: Column): Column = cleanFragment(dropSubtrees(html))

  /** Words in a cleaned (single-spaced, trimmed) string. */
  private def wordsOf(cleaned: Column): Column =
    when(cleaned === "", lit(0)).otherwise(size(split(cleaned, " ")))

  /** Boilerpipe-lite main-content extraction. Per doc: segment into
    * block-tag-delimited blocks, clean each, keep blocks with ≥ `minWords`
    * words and integer link density 3·link_words ≤ words, reassemble kept
    * blocks in document order. Output: (idCol, n_blocks, n_kept,
    * extracted) where n_blocks counts nonempty cleaned blocks. */
  def extractBlocks(
      docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 4): DataFrame = {
    require(minWords >= 1)
    val blocks = docs
      .select(col(idCol), posexplode_outer(
        split(dropSubtrees(col(htmlCol)), blockPat)))
      .select(col(idCol), col("pos"),
        cleanFragment(col("col")).as("btxt"),
        cleanFragment(array_join(
          regexp_extract_all(col("col"), lit(anchorPat), lit(1)), " "))
          .as("ltxt"))
      .filter(col("btxt") =!= "")
      .withColumn("words", wordsOf(col("btxt")))
      .withColumn("link_words", wordsOf(col("ltxt")))
      .withColumn("keep",
        col("words") >= minWords && col("link_words") * 3 <= col("words"))
    val agged = blocks.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(sort_array(collect_list(
          when(col("keep"), struct(col("pos"), col("btxt"))))),
          s => s.getField("btxt")), " ").as("extracted"))
    // markup-only docs (no nonempty block) stay present with zero counts —
    // a curation stage must never silently drop input rows
    docs.select(col(idCol)).join(agged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("extracted"), lit("")).as("extracted"))
  }
}
