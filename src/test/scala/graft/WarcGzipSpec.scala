package graft

import graft.functions.{GzipCodec, GzipDecode, WarcCodec, WarcRecords}
import graft.operators.Warc
import org.apache.spark.sql.functions._

/** The crawl-archive front door: hand-rolled gzip inflate (RFC 1952
  * over the shared DEFLATE machinery) and Content-Length-framed WARC
  * record parsing. Gzip fixtures are produced by the JDK's
  * GZIPOutputStream so the decoder is cross-validated against real
  * zlib dynamic-Huffman streams, not just our own encoder (the
  * PngCodecSpec discipline).
  */
class WarcGzipSpec extends SparkSpec {
  import java.nio.charset.StandardCharsets.UTF_8

  private def jdkGzip(b: Array[Byte]): Array[Byte] = Warc.gzipMember(b)

  // --- gzip: roundtrip -------------------------------------------------

  test("gunzip roundtrips JDK gzip output (text, binary, empty, repetitive)") {
    val cases = Seq(
      "hello crawl world".getBytes(UTF_8),
      Array.tabulate(10000)(i => ((i * 31 + 7) % 251).toByte), // incompressible-ish
      Array.emptyByteArray,
      ("abcabcabc" * 5000).getBytes(UTF_8)) // LZ77 back-references
    cases.foreach { c =>
      val got = GzipCodec.gunzip(jdkGzip(c))
      assert(got != null && java.util.Arrays.equals(got, c))
    }
  }

  test("gunzip concatenates multi-member buffers (the warc.gz layout)") {
    val a = "first record ".getBytes(UTF_8)
    val b = "second record".getBytes(UTF_8)
    val c = "third".getBytes(UTF_8)
    val buf = jdkGzip(a) ++ jdkGzip(b) ++ jdkGzip(c)
    assert(java.util.Arrays.equals(GzipCodec.gunzip(buf), a ++ b ++ c))
    assert(GzipCodec.memberCount(buf).longValue == 3L)
  }

  test("gunzip accepts optional header fields (FNAME, FEXTRA, FCOMMENT, FHCRC skipped)") {
    // hand-build a member with FEXTRA + FNAME + FCOMMENT around a
    // stored-block deflate stream of "xy"
    val payload = "xy".getBytes(UTF_8)
    val deflate = Array[Byte](0x01, 0x02, 0x00, 0xfd.toByte, 0xff.toByte) ++ payload
    val crc = {
      val v = new java.util.zip.CRC32(); v.update(payload); v.getValue
    }
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val extra = Array[Byte](4, 0, 'a', 'b', 'c', 'd') // XLEN=4 + 4 bytes
    val member = Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 16).toByte, // FEXTRA|FNAME|FCOMMENT
      0, 0, 0, 0, 0, 0) ++ extra ++
      ("name.txt".getBytes(UTF_8) :+ 0.toByte) ++
      ("a comment".getBytes(UTF_8) :+ 0.toByte) ++
      deflate ++ le32(crc) ++ le32(payload.length.toLong)
    assert(java.util.Arrays.equals(GzipCodec.gunzip(member), payload))
  }

  // --- gzip: fail-closed validation -----------------------------------

  test("gunzip is null on every malformation class") {
    val good = jdkGzip("some valid payload for corruption".getBytes(UTF_8))
    def mut(i: Int, f: Byte => Byte): Array[Byte] = {
      val c = good.clone(); c(i) = f(c(i)); c
    }
    assert(GzipCodec.gunzip(Array.emptyByteArray) == null)
    assert(GzipCodec.gunzip(mut(0, _ => 'X'.toByte)) == null)          // magic
    assert(GzipCodec.gunzip(mut(2, _ => 7.toByte)) == null)            // CM != 8
    assert(GzipCodec.gunzip(mut(3, b => (b | 0x20).toByte)) == null)   // reserved FLG bit
    assert(GzipCodec.gunzip(good.dropRight(1)) == null)                // truncated trailer
    assert(GzipCodec.gunzip(mut(good.length - 6, b => (b ^ 1).toByte)) == null) // CRC flip
    assert(GzipCodec.gunzip(mut(good.length - 2, b => (b ^ 1).toByte)) == null) // ISIZE flip
    assert(GzipCodec.gunzip(good ++ Array[Byte](0x00)) == null)        // trailing garbage
    assert(GzipCodec.memberCount(good.dropRight(1)) == null)
  }

  // --- WARC framing ----------------------------------------------------

  private def mkRecord(typ: String, id: String, uri: Option[String], payload: Array[Byte]) =
    Warc.renderRecord(typ, id, uri, payload)

  test("warc parse recovers headers, payload bytes, and record order") {
    val p1 = "HTTP/1.1 200 OK\r\n\r\n<html>one</html>".getBytes(UTF_8)
    val p2 = Array[Byte](0, 1, 2, 3, 4) // binary payload is legal
    val buf = mkRecord("response", "r-1", Some("http://x/1"), p1) ++
      mkRecord("metadata", "r-2", None, p2)
    val rows = WarcCodec.parse(buf)
    assert(rows != null && rows.length == 2)
    assert(rows(0).getUTF8String(0).toString == "response")
    assert(rows(0).getUTF8String(1).toString == "<urn:uuid:r-1>")
    assert(rows(0).getUTF8String(2).toString == "http://x/1")
    assert(rows(0).getLong(3) == p1.length)
    assert(java.util.Arrays.equals(rows(0).getBinary(4), p1))
    assert(rows(1).isNullAt(2)) // no target uri
    assert(java.util.Arrays.equals(rows(1).getBinary(4), p2))
  }

  test("warc framing is Content-Length-driven: payload containing 'WARC/1.0' does not split") {
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes(UTF_8)
    val rows = WarcCodec.parse(mkRecord("response", "r", None, tricky))
    assert(rows != null && rows.length == 1)
    assert(java.util.Arrays.equals(rows(0).getBinary(4), tricky))
  }

  test("warc parse is null on every malformation class") {
    val ok = mkRecord("response", "r", None, "abc".getBytes(UTF_8))
    assert(WarcCodec.parse(Array.emptyByteArray) == null)
    assert(WarcCodec.parse("WARC/0.9\r\n".getBytes(UTF_8) ++ ok.drop(10)) == null) // bad magic
    assert(WarcCodec.parse(ok.dropRight(1)) == null)                    // truncated terminator
    assert(WarcCodec.parse(ok ++ "junk".getBytes(UTF_8)) == null)       // trailing garbage
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nabc\r\n\r\n").getBytes(UTF_8)
    assert(WarcCodec.parse(noLen) == null)
    // Content-Length overruns the buffer
    val overrun = ("WARC/1.0\r\nContent-Length: 999\r\n\r\nabc\r\n\r\n").getBytes(UTF_8)
    assert(WarcCodec.parse(overrun) == null)
    // header line without a colon
    val noColon = ("WARC/1.0\r\nbogus header\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n").getBytes(UTF_8)
    assert(WarcCodec.parse(noColon) == null)
  }

  test("warc parse keeps framing on unknown headers (forward compatibility)") {
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val rows = WarcCodec.parse(raw)
    assert(rows != null && rows.length == 1 && rows(0).getLong(3) == 2L)
  }

  // --- end-to-end over the Spark expressions ---------------------------

  test("shard render → gzip_decode → warc_records recovers every record type") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma delta epsilon."), (1L, "one two three four five."),
      (3L, "第一 second third fourth fifth.")) // non-ASCII html payload: byte counts matter
    val shard = Warc.renderShard(0, docs)
    val df = Seq(Tuple1(shard)).toDF("content")
    val recs = df.select(explode(
        WarcRecords.warc_records(GzipDecode.gzip_decode(col("content")))).as("r"))
      .select($"r.warc_type", $"r.content_length", $"r.payload").collect()
    // warcinfo + response per doc + request for ids 0 and 3 (RequestEvery=3)
    assert(recs.length == 1 + docs.length + 2)
    val byType = recs.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byType == Map("warcinfo" -> 1, "request" -> 2, "response" -> 3))
    // content_length matches the rendered byte count incl. multi-byte chars
    recs.filter(_.getString(0) == "response").foreach { r =>
      assert(r.getLong(1) == r.getAs[Array[Byte]](2).length.toLong)
    }
  }

  test("payload digests verify end-to-end; a corrupted payload byte fails verification, framing intact") {
    import spark.implicits._
    val rec = Warc.renderRecord("response", "r-1", Some("https://a.com/x"),
      "HTTP/1.1 200 OK\r\n\r\nbody bytes here".getBytes("US-ASCII"))
    // flip one payload byte (the last byte before the \r\n\r\n terminator)
    val bad = rec.clone(); bad(rec.length - 5) = (bad(rec.length - 5) ^ 1).toByte
    val out = Seq((1L, rec), (2L, bad)).toDF("id", "content")
      .select(col("id"), explode(WarcRecords.warc_records(col("content"))).as("r"))
      .select(col("id"), col("r.payload_digest").as("d"),
        (col("r.payload_digest") ===
          concat(lit("sha1:"), sha1(col("r.payload")))).as("ok"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out(1L)._1.startsWith("sha1:") && out(1L)._2, "intact record must verify")
    assert(out(2L)._1 == out(1L)._1 && !out(2L)._2,
      "corrupted payload must carry the original digest and FAIL verification")
  }

  test("gzip_decode expression is null-strict on corrupt shards (dispatch discipline)") {
    import spark.implicits._
    val good = Warc.renderShard(0, Seq((0L, "alpha beta.")))
    // corrupt the LAST member's stored CRC32 (trailer = final 8 bytes:
    // CRC32 then ISIZE) — MTIME-class header bytes are legal to vary,
    // a checksum is not
    val bad = good.clone(); bad(good.length - 8) = (bad(good.length - 8) ^ 1).toByte
    val out = Seq((1L, good), (2L, bad)).toDF("id", "content")
      .select(col("id"), GzipDecode.gzip_decode(col("content")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else "ok")).toMap
    assert(out(1L) == "ok" && out(2L) == null)
  }

  // --- lenient (recovering) parse ---------------------------------------

  private def concatRecords(recs: Array[Byte]*): Array[Byte] =
    recs.foldLeft(Array.emptyByteArray)(_ ++ _)

  test("lenient parse skips EXACTLY the damaged record and counts it; strict still nulls") {
    val r1 = Warc.renderRecord("response", "r-1", Some("https://a.com/1"),
      "HTTP/1.1 200 OK\r\n\r\nfirst".getBytes(UTF_8))
    val r2 = Warc.renderRecord("response", "r-2", Some("https://a.com/2"),
      "HTTP/1.1 200 OK\r\n\r\nsecond".getBytes(UTF_8))
    val r3 = Warc.renderRecord("response", "r-3", Some("https://a.com/3"),
      "HTTP/1.1 200 OK\r\n\r\nthird".getBytes(UTF_8))
    val bad = r2.clone(); bad(0) = 'X'
    val shard = concatRecords(r1, bad, r3)
    assert(WarcCodec.parse(shard) == null, "strict parse must fail the shard")
    val len = WarcCodec.parseLenient(shard)
    assert(len != null)
    val recs = len.getArray(0)
    assert(recs.numElements() == 2)
    assert(len.getLong(1) == 1L, "one malformed record")
    assert(len.getLong(2) == r2.length.toLong, "skipped exactly the damaged record's bytes")
    val ids = (0 until 2).map(i =>
      recs.getStruct(i, 6).getUTF8String(1).toString)
    assert(ids == Seq("<urn:uuid:r-1>", "<urn:uuid:r-3>"))
  }

  test("lenient parse: damage in the LAST record skips to end; Content-Length lie recovers") {
    val r1 = Warc.renderRecord("response", "r-1", None, "alpha".getBytes(UTF_8))
    val r2 = Warc.renderRecord("response", "r-2", None, "omega".getBytes(UTF_8))
    // tail damage: corrupt last record's magic → skip to end of buffer
    val tailBad = r2.clone(); tailBad(0) = 'Z'
    val l1 = WarcCodec.parseLenient(r1 ++ tailBad)
    assert(l1.getArray(0).numElements() == 1 && l1.getLong(1) == 1L &&
      l1.getLong(2) == r2.length.toLong)
    // header damage deeper than the magic: inflate the Content-Length
    // so the terminator check fails — recovery must resume at r2
    val s = new String(r1, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lied = s.replace("Content-Length: 5", "Content-Length: 7")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val l2 = WarcCodec.parseLenient(lied ++ r2)
    assert(l2.getArray(0).numElements() == 1 && l2.getLong(1) == 1L)
    assert(l2.getArray(0).getStruct(0, 6).getUTF8String(1).toString == "<urn:uuid:r-2>")
  }

  test("frontier redirect classes: 301/308 rewrite the canonical, 302/303/307 keep the source") {
    import spark.implicits._
    def resp(id: Long, status: Int): (String, String, String, Long, Array[Byte], String) = {
      val payload = (s"HTTP/1.1 $status X\r\nLocation: https://new.com/p\r\n\r\n")
        .getBytes(UTF_8)
      ("response", s"<urn:uuid:r-$id>", s"https://old$id.com/a", payload.length.toLong,
        payload, null)
    }
    val recs = Seq(resp(1, 301), resp(2, 302), resp(3, 303), resp(4, 307), resp(5, 308))
      .toDF("warc_type", "record_id", "target_uri", "content_length",
        "payload", "payload_digest")
    val got = Warc.frontierWithRedirects(recs,
        regexp_extract(col("record_id"), "r-([0-9]+)>$", 1).cast("long"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // permanent (1, 5) collapse onto the target canonical; the rest
    // keep their own source canonicals
    assert(got("https://new.com/p") == ((1L, 2L)))
    assert(Set("https://old2.com/a", "https://old3.com/a", "https://old4.com/a")
      .forall(c => got(c)._2 == 1L))
    assert(!got.contains("https://old1.com/a") && !got.contains("https://old5.com/a"))
  }

  test("sitemap seeds: loc extraction unescapes entities and collapses re-crawl variants") {
    import spark.implicits._
    val xml = graft.operators.Urls.renderSitemap(Seq(
      "https://site3.com/Articles/7?page=1&utm_source=feed", // variant A
      "https://WWW.site3.com/Articles/7/?page=1",            // variant B, same page
      "https://site3.com/Articles/8"))
    assert(xml.contains("&amp;") && !xml.contains("?page=1&utm")) // escaping happened
    val got = graft.operators.Urls.sitemapSeeds(
        Seq(("file:/x/sitemap-site3.xml", xml)).toDF("path", "xml"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3, 3L, 2L))) // 3 locs, 2 distinct canonical pages
  }

  test("lenient parse on a CLEAN shard equals the strict parse with zero damage counted") {
    val shard = Warc.renderShard(0, Seq((0L, "alpha beta."), (1L, "gamma delta.")))
    val bytes = GzipCodec.gunzip(shard)
    val strict = WarcCodec.parse(bytes)
    val len = WarcCodec.parseLenient(bytes)
    assert(len.getLong(1) == 0L && len.getLong(2) == 0L)
    assert(len.getArray(0).numElements() == strict.length)
  }

  test("truncated captures: the marker surfaces, Content-Length frames the stored (cut) bytes") {
    val docs = Seq(7L -> ("lorem ipsum " * 30).trim, 8L -> "short doc text")
    val rows = WarcCodec.parse(
      graft.functions.GzipCodec.gunzip(Warc.renderTruncatedShard(0, docs)))
    assert(rows != null)
    val byId = rows.filter(_.getUTF8String(0).toString == "response")
      .map(r => r.getUTF8String(1).toString -> r).toMap
    val t = byId("<urn:uuid:graft-response-7>") // 7 % 9 == 7: truncated
    assert(t.getUTF8String(7).toString == "length")
    val full7 = Warc.responsePayload(7L, graft.operators.Html.wrapLine(7L, docs.head._2))
    assert(t.getLong(3) == full7.length / 2)
    assert(t.getBinary(4).length == full7.length / 2)
    // untruncated sibling: no marker, full payload
    val u = byId("<urn:uuid:graft-response-8>")
    assert(u.isNullAt(7))
  }

  test("revisit records: refers_to surfaces, digest points at the ORIGINAL payload") {
    val docs = Seq(1L -> "alpha text", 2L -> "beta text", 6L -> "gamma text")
    val shard = Warc.renderRevisitShard(0, docs)
    val rows = WarcCodec.parse(graft.functions.GzipCodec.gunzip(shard))
    assert(rows != null)
    val byType = rows.groupBy(_.getUTF8String(0).toString)
    // 2 and 6 are ≡ RevisitPhase (mod RevisitEvery); 1 is not
    assert(byType("revisit").length == 2)
    assert(byType("response").length == 3)
    val rev = byType("revisit").map(r =>
      r.getUTF8String(1).toString -> r).toMap
    val resp = byType("response").map(r =>
      r.getUTF8String(1).toString -> r).toMap
    for (id <- Seq(2L, 6L)) {
      val rv = rev(s"<urn:uuid:graft-revisit-$id>")
      // refers_to names the stored original (field 6)
      assert(rv.getUTF8String(6).toString == s"<urn:uuid:graft-response-$id>")
      // empty payload, but the digest equals the ORIGINAL response's
      val orig = resp(s"<urn:uuid:graft-response-$id>")
      assert(rv.getLong(3) == 0L)
      assert(rv.getUTF8String(5).toString == orig.getUTF8String(5).toString)
      assert(rv.getUTF8String(5).toString ==
        Warc.payloadDigestOf(orig.getBinary(4)))
    }
    // non-revisit records keep a null refers_to (forward compatibility)
    assert(resp.values.forall(_.isNullAt(6)))
    // and the response stream is byte-identical to the plain shard's
    // (the shared-oracle guarantee): strip revisit members and compare
    val plain = WarcCodec.parse(
      graft.functions.GzipCodec.gunzip(Warc.renderShard(0, docs)))
    val keep = rows.filter(_.getUTF8String(0).toString != "revisit")
    assert(keep.length == plain.length)
    keep.zip(plain).foreach { case (a, b) =>
      assert(a.getUTF8String(1).toString == b.getUTF8String(1).toString)
      assert(java.util.Arrays.equals(a.getBinary(4), b.getBinary(4)))
    }
  }
}
