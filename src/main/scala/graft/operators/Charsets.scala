package graft.operators

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

/** Charset-realism fixture + queries: the legacy-encoding corner of the
  * crawl front door.
  *
  * Real crawls are full of Shift_JIS / EUC-JP / EUC-KR / GBK / Big5 /
  * windows-1251 pages, and the declaration frequently lives only in a
  * `<meta charset>` tag (or a BOM), not the Content-Type header. This
  * fixture renders the multilingual corpus into a `.warc.gz` archive
  * whose responses rotate through TEN legacy encodings (incl. the
  * escape-sequence ISO-2022-JP family and BOM-less UTF-16) and FOUR
  * declaration channels, so the engine's WHATWG-order sniff
  * ([[graft.functions.HttpCodec]]: BOM → header → meta prescan →
  * UTF-16 first-bytes sniff → utf-8 default) is exercised on every
  * tier — including the tier ordering itself (the BOM docs carry a
  * LYING header that the sniff must overrule), the prescan's blind
  * spot (a BOM-less UTF-16 page's meta tag is NUL-interleaved and
  * invisible to the ASCII prescan — the `<\0`/`\0<` first-bytes tier
  * must decide), and the failure mode (undeclared non-UTF-8 bytes →
  * counted U+FFFD replacements, never silent).
  *
  * FIXTURE DISCIPLINE (the Warc rule): every axis is a pure function
  * of doc_id and every decoded text is reconstructable in SQL, so the
  * oracle predicts the full output — decoded text included — from the
  * `documents` table alone. The legacy encode happens ONLY in fixture
  * staging (JDK charsets); the engine-side decode is the HttpCodec
  * sniff. Axes:
  *
  *   - mode = doc_id % 4: 0 = charset in the Content-Type header;
  *     1 = header bare `text/html`, charset only in `<meta charset>`;
  *     2 = BOM (utf-8 / utf-16le / utf-16be) + a WRONG header label
  *     (`charset=shift_jis`) the BOM must overrule; 3 = no declaration
  *     anywhere and k raw 0xFF bytes appended to an ASCII body — the
  *     utf-8 fallback must emit exactly k U+FFFD replacements.
  *   - slot = (doc_id div 4) % 8 picks (encoding, language, text):
  *     shift_jis/ja, euc-jp/ja, euc-kr/ko, gbk/zh-hans, big5/zh-hant,
  *     windows-1251/ru, iso-8859-2/de, windows-1253/el. The ja/ru/de/el
  *     texts are [[TextOps.UnicodeFixture]]'s (one rendering, mirrored
  *     verbatim into SQL); ko and the two zh texts live here.
  *   - bomEnc / k = (doc_id div 4) % 3 (+1 for k).
  *
  * At 100 TB this whole tier is the same map-only zero-shuffle pass as
  * the rest of the front door — the sniff is one codegen'd expression
  * per record, and the audit is a single hash aggregate over four
  * grouping keys.
  *
  * Reference cell: the charset-agnostic byte→text boundary of
  * `sourceHandleLines` (/root/reference/src/Data/Conduino/Combinators.hs:245-275)
  * — this tier is what that boundary needs once the bytes are real
  * crawl pages instead of trusted local files.
  */
object Charsets {

  import java.nio.charset.Charset

  /** Slot table: (wire label = canonical registry label, lang, text).
    * Texts chosen to round-trip their slot encoding (staging asserts
    * it), with the four reused from TextOps.UnicodeFixture looked up
    * so the two fixtures can never drift apart.
    */
  private val UF: Map[String, String] = TextOps.UnicodeFixture.toMap
  val Slots: IndexedSeq[(String, String, String)] = IndexedSeq(
    ("shift_jis", "ja", UF("ja")),
    ("euc-jp", "ja", UF("ja")),
    ("euc-kr", "ko", "고양이 는 따뜻한 방 에서 조용히 잠 을 잡니다 ."),
    ("gbk", "zh", "计算机 在 网络 上 快速 处理 大量 数据 。"),
    ("big5", "zh", "電腦 在 網路 上 快速 處理 大量 資料 。"),
    ("windows-1251", "ru", UF("ru")),
    ("iso-8859-2", "de", UF("de")),
    ("windows-1253", "el", UF("el")),
    // round-14 tail: the ESCAPE-SEQUENCE family (older JP pages/mail
    // archives) and BOM-LESS UTF-16 — in mode 1 the latter's meta tag
    // is invisible to the ASCII prescan (NUL-interleaved bytes), so
    // the first-bytes `<\0` sniff tier must decide (source 'sniff16')
    ("iso-2022-jp", "ja", UF("ja")),
    ("utf-16le", "ko", "고양이 는 따뜻한 방 에서 조용히 잠 을 잡니다 ."))

  private val SlotCharsets: IndexedSeq[Charset] = IndexedSeq(
    Charset.forName("Shift_JIS"), Charset.forName("EUC-JP"),
    Charset.forName("EUC-KR"), Charset.forName("GBK"),
    Charset.forName("Big5"), Charset.forName("windows-1251"),
    Charset.forName("ISO-8859-2"), Charset.forName("windows-1253"),
    Charset.forName("ISO-2022-JP"),
    java.nio.charset.StandardCharsets.UTF_16LE)

  /** 0-based slot whose mode-1 declaration channel is the UTF-16
    * first-bytes sniff instead of the meta prescan.
    */
  val Utf16Slot: Int = Slots.indexWhere(_._1 == "utf-16le")

  val BomLabels: IndexedSeq[String] = IndexedSeq("utf-8", "utf-16le", "utf-16be")
  private val BomCharsets: IndexedSeq[Charset] = IndexedSeq(
    java.nio.charset.StandardCharsets.UTF_8,
    java.nio.charset.StandardCharsets.UTF_16LE,
    java.nio.charset.StandardCharsets.UTF_16BE)
  private val BomBytes: IndexedSeq[Array[Byte]] = IndexedSeq(
    Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte),
    Array(0xff.toByte, 0xfe.toByte),
    Array(0xfe.toByte, 0xff.toByte))

  def modeOf(id: Long): Int = (id % 4).toInt
  def slotOf(id: Long): Int = ((id / 4) % Slots.size).toInt
  def bomEncOf(id: Long): Int = ((id / 4) % 3).toInt
  def fffdOf(id: Long): Int = ((id / 4) % 3).toInt + 1

  /** Page templates — ASCII literals around the slot text, mirrored
    * verbatim into [[fixtureSql]]. The slot texts contain no `&<>"`,
    * so they embed raw (staging asserts that too).
    */
  def htmlNoMeta(id: Long, text: String): String =
    "<html><head><title>D" + id + "</title></head><body data-doc=\"" + id +
      "\"><p>" + text + "</p></body></html>"
  def htmlMeta(id: Long, label: String, text: String): String =
    "<html><head><meta charset=\"" + label + "\"><title>D" + id +
      "</title></head><body data-doc=\"" + id + "\"><p>" + text +
      "</p></body></html>"
  def mojibakeBase(id: Long): String = "charset audit doc " + id + " payload"

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Full response payload for one doc — envelope header + body in the
    * doc's wire encoding. Staging self-checks the legacy round trip
    * (an unencodable fixture text must fail staging, not the hash
    * compare downstream).
    */
  def responsePayload(id: Long): Array[Byte] = {
    val mode = modeOf(id)
    val slot = slotOf(id)
    val (label, _, text) = Slots(slot)
    require(!text.exists(c => c == '&' || c == '<' || c == '>' || c == '"'),
      s"slot $slot text has markup chars; the raw-embed templates assume none")
    mode match {
      case 0 =>
        val html = htmlNoMeta(id, text)
        val body = html.getBytes(SlotCharsets(slot))
        require(new String(body, SlotCharsets(slot)) == html,
          s"slot $slot ($label) does not round-trip doc $id")
        ascii(s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$label\r\n\r\n") ++ body
      case 1 =>
        val html = htmlMeta(id, label, text)
        val body = html.getBytes(SlotCharsets(slot))
        require(new String(body, SlotCharsets(slot)) == html,
          s"slot $slot ($label) does not round-trip doc $id (meta mode)")
        ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n") ++ body
      case 2 =>
        val be = bomEncOf(id)
        val html = htmlNoMeta(id, text)
        // the header LIES (shift_jis) — the BOM must win the sniff
        ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n\r\n") ++
          BomBytes(be) ++ html.getBytes(BomCharsets(be))
      case _ =>
        val k = fffdOf(id)
        ascii("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n") ++
          ascii(mojibakeBase(id)) ++ Array.fill(k)(0xff.toByte)
    }
  }

  /** Render one `.warc.gz` shard of charset-varied responses (same
    * Common Crawl member-per-record layout as [[Warc.renderShard]]).
    * The doc text argument is unused — the page text is the slot's,
    * so the decode output is predictable without re-deriving the
    * corpus text through a legacy encoding it may not fit in.
    */
  def renderShard(shardIdx: Int, docs: Seq[(Long, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Warc.gzipMember(Warc.renderRecord("warcinfo",
      s"graft-charsetinfo-$shardIdx", None, ascii(Warc.WarcinfoPayload))))
    docs.foreach { case (id, _) =>
      bos.write(Warc.gzipMember(Warc.renderRecord("response",
        s"graft-charset-$id", Some(Urls.urlOf(id)), responsePayload(id))))
    }
    bos.toByteArray
  }

  /** Decoded per-doc sniff results over the charset archive: declared
    * vs used label, the sniff tier that decided, the decoded text, and
    * the U+FFFD observability counters. Map-only (the gzip + WARC +
    * envelope chain), zero shuffle.
    */
  def decode(recs: DataFrame): DataFrame =
    recs.filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("record_id"), "graft-charset-([0-9]+)>$", 1)
          .cast("long").as("doc_id"),
        graft.functions.HttpResponse.http_response(col("payload")).as("env"))
      .select(col("doc_id"),
        col("env.charset").as("charset_declared"),
        col("env.charset_used").as("charset_used"),
        col("env.charset_source").as("charset_source"),
        col("env.text").as("text"),
        col("env.n_fffd").as("n_fffd"),
        // greatest(…,1): a zero-length 200 body is legal — div-by-zero
        // yields null in Spark but errors in the DuckDB oracle, so both
        // sides guard identically (the ndig stat's greatest discipline)
        expr("env.n_fffd * 1000000L div greatest(length(env.text), 1L)").as("fffd_ppm"))

  /** Corpus-level mojibake audit (the q_html_audit sibling for the
    * byte→text boundary): per sniff tier, docs seen, docs with any
    * replacement, total replacements, and the replacement ppm over
    * total decoded chars. One hash aggregate over four groups.
    */
  def audit(recs: DataFrame): DataFrame =
    decode(recs)
      .groupBy(col("charset_source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_fffd") > 0L, 1L).otherwise(0L)).as("n_mojibake_docs"),
        sum(col("n_fffd")).as("total_fffd"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .withColumn("fffd_ppm", expr("total_fffd * 1000000L div greatest(total_chars, 1L)"))

  // ---------------------------------------------------------------------
  // Oracle SQL (DuckDB) — predicts every output column from documents
  // ---------------------------------------------------------------------

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"
  private def listOf(xs: Seq[String]): String = "[" + xs.map(sq).mkString(", ") + "]"

  /** The slot texts as a DuckDB list literal + the doc→slot index
    * expression — shared by every oracle that predicts a slot text
    * (charset decode, CJK PDF extraction), so the fixtures can never
    * drift from their oracles.
    */
  def slotTextsSql: String = listOf(Slots.map(_._3))
  def slotLangsSql: String = listOf(Slots.map(_._2))
  def slotIndexSql: String = s"((doc_id // 4) % ${Slots.size})::INT + 1"

  /** Slot language of a doc-id COLUMN — the fixture's stand-in for the
    * declared-language metadata a real corpus carries alongside its
    * pages (training labels for the trained lang-ID).
    */
  def slotLang(docId: Column): Column =
    element_at(array(Slots.map(s => lit(s._2)): _*),
      (((docId / 4).cast("long") % Slots.size) + 1).cast("int"))

  /** The decoded non-mojibake corpus with slot-language labels —
    * (doc_id, text, lang), the trained lang-ID's training table.
    */
  def labeledCorpus(recs: DataFrame): DataFrame =
    decode(recs).filter(col("charset_source") =!= "default")
      .select(col("doc_id"), col("text"), slotLang(col("doc_id")).as("lang"))

  /** DuckDB mirror of [[labeledCorpus]] as a parenthesized FROM-able
    * derived table.
    */
  def labeledCorpusSql: String =
    s"""(SELECT f.doc_id, f.text,
           list_extract($slotLangsSql, $slotIndexSql) AS lang
         FROM ($fixtureSql) f WHERE f.doc_id % 4 <> 3) lc"""

  /** The per-doc prediction as a CTE body over `documents`. */
  def fixtureSql: String = {
    val labels = listOf(Slots.map(_._1))
    val texts = listOf(Slots.map(_._3))
    val boms = listOf(BomLabels)
    val slot = s"((doc_id // 4) % ${Slots.size})::INT + 1"
    val bomE = "((doc_id // 4) % 3)::INT + 1"
    val k = "(doc_id // 4) % 3 + 1"
    val slotLabel = s"list_extract($labels, $slot)"
    val slotText = s"list_extract($texts, $slot)"
    val bomLabel = s"list_extract($boms, $bomE)"
    val noMeta = "'<html><head><title>D' || doc_id || '</title></head><body data-doc=\"' " +
      s"|| doc_id || '\"><p>' || $slotText || '</p></body></html>'"
    val withMeta = s"'<html><head><meta charset=\"' || $slotLabel || '\"><title>D' || doc_id " +
      "|| '</title></head><body data-doc=\"' || doc_id || '\"><p>' " +
      s"|| $slotText || '</p></body></html>'"
    val moji = s"'charset audit doc ' || doc_id || ' payload' || repeat(chr(65533), ($k)::INT)"
    s"""SELECT doc_id,
          CASE doc_id % 4 WHEN 0 THEN $slotLabel WHEN 2 THEN 'shift_jis' ELSE NULL END AS charset_declared,
          CASE doc_id % 4 WHEN 0 THEN $slotLabel WHEN 1 THEN $slotLabel
               WHEN 2 THEN $bomLabel ELSE 'utf-8' END AS charset_used,
          CASE doc_id % 4 WHEN 0 THEN 'header'
               WHEN 1 THEN (CASE WHEN $slot = ${Utf16Slot + 1}
                            THEN 'sniff16' ELSE 'meta' END)
               WHEN 2 THEN 'bom' ELSE 'default' END AS charset_source,
          CASE doc_id % 4 WHEN 0 THEN $noMeta WHEN 1 THEN $withMeta
               WHEN 2 THEN $noMeta ELSE $moji END AS text,
          CAST(CASE doc_id % 4 WHEN 3 THEN $k ELSE 0 END AS BIGINT) AS n_fffd
        FROM documents"""
  }

  /** Oracle for the lang-ID composition: every non-mojibake doc must
    * identify as its SLOT's language (the fixture texts each carry
    * their language's function words).
    */
  def langIdOracleSql: String = {
    val langs = listOf(Slots.map(_._2))
    s"""SELECT doc_id,
          list_extract($langs, ((doc_id // 4) % ${Slots.size})::INT + 1) AS lang_pred
        FROM documents WHERE doc_id % 4 <> 3"""
  }

  def decodeOracleSql: String =
    s"""WITH fx AS (${fixtureSql})
        SELECT doc_id, charset_declared, charset_used, charset_source, text,
               n_fffd, n_fffd * 1000000 // greatest(length(text), 1) AS fffd_ppm
        FROM fx"""

  def auditOracleSql: String =
    s"""WITH fx AS (${fixtureSql})
        SELECT charset_source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_fffd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake_docs,
               CAST(sum(n_fffd) AS BIGINT) AS total_fffd,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST(sum(n_fffd) AS BIGINT) * 1000000 // greatest(CAST(sum(length(text)) AS BIGINT), 1) AS fffd_ppm
        FROM fx GROUP BY charset_source"""
}
