package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-wise decode/feature-extract over partitions.
  *
  * No external image/audio codec libraries exist in this environment, so
  * the feature-extract step is STUBBED with a deterministic byte-level
  * extractor (a 4-bin byte histogram). Everything around it — the typed
  * schema, the Dataset[Media] → mapPartitions → Dataset[MediaFeatures]
  * pipeline shape, partition-sized batching, and the binary-column I/O — is
  * real and is what a production decode (JNI codec / ONNX runtime per
  * partition) would plug into. The perceptual near-dup path additionally
  * has a REAL image decode since round 8: [[dhashImage]] runs payloads
  * through the JDK's built-in `javax.imageio` codecs (PNG et al.) into the
  * standard 9×8-grid gradient dHash, with the byte stub as the fallback
  * for undecodable payloads — spec-exercised end-to-end on PNGs generated
  * in-test.
  */
object Multimodal {

  /** A media row: id + opaque payload + metadata. */
  final case class Media(doc_id: Long, mime: String, content: Array[Byte])

  /** Extracted features: byte length, integrity hash, fixed-size features. */
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** Build a binary media table from `documents` (UTF-8 payloads standing in
    * for image/audio bytes). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    documents(spark, sfDir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Media]
  }

  /** STUB decoder: a real implementation would decode the payload (image
    * decode, audio resample, video frame-sample) inside the partition loop;
    * this deterministic byte histogram keeps the identical pipeline shape.
    * Bins: byte >> 5 clamped to 4 bins (ASCII text lands in bins 1–3). */
  private def decodeStub(m: Media): MediaFeatures = {
    val bins = new Array[Long](4)
    var i = 0
    while (i < m.content.length) {
      val b = m.content(i) & 0xff
      bins(math.min(b / 32, 3)) += 1
      i += 1
    }
    MediaFeatures(m.doc_id, m.mime, m.content.length.toLong,
      bins(0), bins(1), bins(2), bins(3))
  }

  /** Partition-wise decode/feature-extract: the Spark shape for batch media
    * processing (one decoder init per partition, streamed rows). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec context, model session)
      it.map(decodeStub)
    }
  }

  /** The full plumbing as a query: documents → binary → features. Oracle:
    * the byte histogram of ASCII text is expressible over chars in SQL. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        col("f0"), col("f1"), col("f2"), col("f3"))
      .orderBy(col("doc_id"))

  /** A sampled "frame" with its features (video/audio frame-sampling shape). */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, n_bytes: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** Frame-sampling stub: split the payload into fixed-size frames, keep
    * every `stride`-th, extract features per frame. The real counterpart
    * (video frame decode / audio windowing) has the identical Spark shape:
    * one input row explodes to a bounded number of frame rows, feature
    * extraction stays inside the partition iterator. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 256,
      stride: Int = 4): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = (m.content.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { fi =>
          val from = fi * frameBytes
          val until = math.min(from + frameBytes, m.content.length)
          val bins = new Array[Long](4)
          var i = from
          while (i < until) {
            bins(math.min((m.content(i) & 0xff) / 32, 3)) += 1
            i += 1
          }
          FrameFeatures(m.doc_id, fi, (until - from).toLong,
            bins(0), bins(1), bins(2), bins(3))
        }
      }
    }
  }

  /** Frame-sampling as a gate query: fixed-size character frames with
    * stride, per-frame class-histogram features — the [[sampleFrames]]
    * pipeline shape (one row explodes to a bounded number of frame rows
    * inside the partition iterator) at char level so the DuckDB oracle can
    * recompute it with substr (byte-level frames are not sliceable in
    * portable SQL). Bin = min(codepoint/32, 3), identical to [[features]]. */
  def frameStats(spark: SparkSession, sfDir: String,
      frameChars: Int = 256, stride: Int = 2): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, s) =>
          // code points, not UTF-16 units: DuckDB length/substr/unicode are
          // code-point-based, and frame boundaries must agree for any
          // supplementary-plane character
          val cps = s.codePoints().toArray
          val nFrames = (cps.length + frameChars - 1) / frameChars
          (0 until nFrames by stride).iterator.map { fi =>
            val from = fi * frameChars
            val until = math.min(from + frameChars, cps.length)
            val bins = new Array[Long](4)
            var i = from
            while (i < until) {
              bins(math.min(cps(i) / 32, 3)) += 1
              i += 1
            }
            (id, fi.toLong, (until - from).toLong, bins(0), bins(1), bins(2), bins(3))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_chars", "f0", "f1", "f2", "f3")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** DuckDB twin of [[frameStats]]. */
  def frameStatsOracleSql(frameChars: Int = 256, stride: Int = 2): String = {
    def bin(k: Int) =
      s"""CAST(len(list_filter(string_split(frame, ''),
         |    ch -> CAST(least(floor(unicode(ch) / 32), 3) AS BIGINT) = $k)) AS BIGINT) AS f$k""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents
       |), f AS (
       |  SELECT doc_id, i AS frame_idx,
       |    substr(text, CAST(i * $frameChars + 1 AS INTEGER), $frameChars) AS frame
       |  FROM d, unnest(range(0, CAST(ceil(n / ${frameChars}.0) AS BIGINT), $stride)) AS t(i)
       |)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(length(frame) AS BIGINT) AS n_chars,
       |  ${bin(0)},
       |  ${bin(1)},
       |  ${bin(2)},
       |  ${bin(3)}
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Resize stub: downsample a feature vector to `target` buckets by
    * summation — the pipeline shape of an image resize (deterministic,
    * bucket-sum pooling). */
  def resizeFeatures(features: Array[Long], target: Int): Array[Long] = {
    val out = new Array[Long](target)
    var i = 0
    while (i < features.length) {
      out(i * target / features.length) += features(i)
      i += 1
    }
    out
  }

  /** Binary-column metadata: sizes + integrity hashes straight over the
    * binary payload (codegen built-ins, no UDF). */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content"))
      .select(col("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        sha2(col("content"), 256).as("sha256"),
        md5(col("content")).as("md5"))
      .orderBy(col("doc_id"))

  // ---- Perceptual near-dup over the binary payload ----

  /** 63-bit byte-gradient signature (the dHash shape): sample 64 positions
    * evenly across the payload, set bit j when sample j is byte-wise
    * smaller than sample j+1. The real counterpart hashes pixel gradients
    * of a decoded, downscaled image — identical signature algebra, decode
    * swapped into this stub. 63 bits, not 64: the sign bit stays clear so
    * the banding arithmetic (and the oracle's `<<`) never touches signed
    * overflow — same convention as the 63-bit SimHash/MD5 hashes. */
  private[graft] def dhashStub(content: Array[Byte]): Long = {
    val n = content.length
    if (n < 2) 0L
    else {
      var sig = 0L
      var j = 0
      while (j < 63) {
        val p = (j.toLong * (n - 1)) / 63
        val q = ((j + 1).toLong * (n - 1)) / 63
        if ((content(p.toInt) & 0xff) < (content(q.toInt) & 0xff)) sig |= 1L << j
        j += 1
      }
      sig
    }
  }

  /** REAL image decode for the perceptual path (round-8: no longer only a
    * byte stub): decode the payload with `javax.imageio` (JDK-built-in
    * codecs — PNG/BMP/GIF/JPEG; PNG is lossless so the decode is
    * bit-exact), integer area-average the luma onto a 9×8 grid, and emit
    * the classic horizontal-gradient dHash — bit j set when cell (r,c) is
    * darker than its right neighbour (8 rows × 8 gradients, the final one
    * dropped to keep the 63-bit sign-clear convention shared with
    * [[dhashStub]]/SimHash, so the banding algebra is unchanged). All
    * arithmetic is integer (luma = (299R+587G+114B) div 1000, exact cell
    * sums, floor average), so the signature is deterministic across JVMs
    * and partitionings. Payloads ImageIO cannot decode fall back to the
    * byte-level [[dhashStub]] — the mixed-corpus behavior a real pipeline
    * needs (EOFs, truncated files, non-image rows). */
  private[graft] def dhashImage(content: Array[Byte]): Long = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) dhashStub(content)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w < 2 || h < 1) dhashStub(content)
      else {
        val (gw, gh) = (9, 8)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val sums = Array.ofDim[Long](gh * gw)
        val counts = Array.ofDim[Long](gh * gw)
        var y = 0
        while (y < h) {
          val cy = (y.toLong * gh / h).toInt min (gh - 1)
          var x = 0
          while (x < w) {
            val cx = (x.toLong * gw / w).toInt min (gw - 1)
            val p = rgb(y * w + x)
            val luma = (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
              114L * (p & 0xff)) / 1000L
            sums(cy * gw + cx) += luma
            counts(cy * gw + cx) += 1
            x += 1
          }
          y += 1
        }
        def cell(r: Int, c: Int): Long = {
          val i = r * gw + c
          if (counts(i) == 0) 0L else sums(i) / counts(i)
        }
        var sig = 0L
        var j = 0
        var r = 0
        while (r < gh) {
          var c = 0
          while (c < gw - 1) {
            if (j < 63 && cell(r, c) < cell(r, c + 1)) sig |= 1L << j
            j += 1
            c += 1
          }
          r += 1
        }
        sig
      }
    }
  }

  /** Near-duplicate media pairs by perceptual signature: dHash per payload
    * (inside the partition-wise decode loop, where a production pipeline
    * already sits), then the same 16-bit-band blocking + hamming verify as
    * SimHash — candidates are band-bucket collisions only, never all
    * pairs; identical payloads collide on every band at hamming 0.
    *
    * `sig` selects the decoder: the byte-level [[dhashStub]] keeps the
    * gate oracle-checkable over the synthetic text payloads (default,
    * unchanged), [[dhashImage]] runs the REAL image decode — same
    * signature algebra, same plan.
    *
    * Scale shape: one decode pass (map), a 4×-exploded band-bucket
    * shuffle whose key space is 2¹⁶·4, candidate verify on sketch-sized
    * rows. The signature is 8 bytes per asset — the join never carries
    * payloads. */
  def nearDupMediaPairs(media: Dataset[Media],
      maxHamming: Int = 6,
      sig: Array[Byte] => Long = dhashStub): DataFrame = {
    import media.sparkSession.implicits._
    val sigFn = sig
    val sigs = media
      .mapPartitions(it => it.map(m => (m.doc_id, sigFn(m.content))))
      .toDF("doc_id", "sig")
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("bandSig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("sig"),
        col("bs.band").as("band"), col("bs.bandSig").as("bandSig"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandSig") === col("b.bandSig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long")
          .as("hamming"))
      // filter BEFORE the distinct: hamming is a pure function of the
      // pair, so this is semantically identical and the dedup shuffle
      // carries only survivors, not the (dominant) far-pair population
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  /** Gate query: the synthetic corpus carries no byte-level near-dups (its
    * closest band-colliding pair sits at hamming 10), so the gate builds
    * them deterministically — every 5th document gains a variant under a
    * fresh id with ONE character substituted at position 51. The
    * substitution is length-preserving, so the 63 sampled positions stay
    * aligned and only gradients adjacent to the edit can flip: variant
    * pairs land at hamming ≤ 2, and ≤3 flipped bits can dirty at most 3 of
    * the 4 bands, so a clean band — and thus candidacy — is guaranteed by
    * pigeonhole. The operator under test is [[nearDupMediaPairs]]; the
    * corpus augmentation is scaffolding, mirrored exactly in the oracle. */
  def nearDupMedia(spark: SparkSession, sfDir: String,
      maxHamming: Int = 6): DataFrame = {
    import spark.implicits._
    // the oracle samples CHAR positions while the engine hashes UTF-8 BYTES
    // (char == byte only for ASCII), so the ASCII assumption is ENFORCED on
    // both sides, not assumed: a non-ASCII document would silently diverge
    // engine vs oracle (byte-vs-char indexing shifts every sampled
    // position). The synthetic corpus is pure ASCII today — the filter is
    // the guard that keeps the gate honest if that ever changes.
    val base = documents(spark, sfDir).select(col("doc_id"), col("text"))
      .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
    val variants = base
      .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 52)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 50), lit("Z"),
          expr("substring(text, 52)")).as("text"))
    val media = base.unionByName(variants)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[Media]
    nearDupMediaPairs(media, maxHamming)
  }

  /** DuckDB twin of [[nearDupMedia]] — the 63 sampled byte comparisons
    * written out longhand over chars (the corpus is pure ASCII, so
    * char == byte; `mm_features` relies on the same equivalence), then
    * identical banding and verification. */
  def nearDupMediaOracleSql(maxHamming: Int = 6): String = {
    val sigTerms = (0 until 63).map { j =>
      s"(CASE WHEN unicode(substr(text, CAST(($j * (n - 1)) // 63 AS INTEGER) + 1, 1)) < " +
        s"unicode(substr(text, CAST((${j + 1} * (n - 1)) // 63 AS INTEGER) + 1, 1)) " +
        s"THEN CAST(1 AS BIGINT) << $j ELSE 0 END)"
    }.mkString(" +\n      ")
    s"""WITH ascii_docs AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE regexp_matches(text, '^[\\x00-\\x7F]*$$')
       |), corpus AS (
       |  SELECT doc_id, text FROM ascii_docs
       |  UNION ALL
       |  SELECT doc_id + 1000000, substr(text, 1, 50) || 'Z' || substr(text, 52)
       |  FROM ascii_docs WHERE doc_id % 5 = 0 AND length(text) >= 52
       |), t AS (
       |  SELECT doc_id, text, length(text) AS n FROM corpus
       |), sig AS (
       |  SELECT doc_id,
       |    CASE WHEN n < 2 THEN 0 ELSE
       |      $sigTerms
       |    END AS sig
       |  FROM t
       |), banded AS (
       |  SELECT doc_id, sig, b.band, (sig >> (16 * b.band)) & 65535 AS bandsig
       |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
       |)
       |SELECT id1, id2, hamming FROM cand
       |WHERE hamming <= $maxHamming
       |ORDER BY id1, id2""".stripMargin
  }

  // ---- exact binary dedup -------------------------------------------------

  /** EXACT binary dedup of media payloads — duplicate groups by content
    * SHA-256, the first pass of every multimodal dedup pipeline (byte-
    * identical re-uploads, mirrored assets) before any perceptual
    * comparison runs: a 32-byte-key shuffle regardless of payload size,
    * and at fleet scale the hash is computed ONCE at ingest and stored as
    * a column, making this a pure metadata aggregate. Reports per group:
    * copies, payload bytes, the canonical (min-id) survivor, and the
    * reclaimable `wasted_bytes = (n−1)·bytes`. */
  def exactDupGroups(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .select(col("doc_id"), sha2(col("content"), 256).as("sha256"),
        length(col("content")).cast("long").as("n_bytes"))
      .groupBy(col("sha256"), col("n_bytes"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_copies") > 1)
      .select(col("sha256"), col("n_copies"), col("n_bytes"),
        col("canonical_id"),
        ((col("n_copies") - 1) * col("n_bytes")).as("wasted_bytes"))
      .orderBy(col("canonical_id"))

  /** DuckDB twin of [[exactDupGroups]]. */
  def exactDupGroupsOracleSql: String =
    """WITH b AS (
      |  SELECT doc_id, sha256(text) AS sha256,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents
      |), g AS (
      |  SELECT sha256, n_bytes, count(*) AS n_copies,
      |    min(doc_id) AS canonical_id
      |  FROM b GROUP BY 1, 2
      |)
      |SELECT sha256, n_copies, n_bytes, canonical_id,
      |  (n_copies - 1) * n_bytes AS wasted_bytes
      |FROM g WHERE n_copies > 1
      |ORDER BY canonical_id""".stripMargin

  // ---- generated PNG corpus: REAL decode, still hash-verified -------------

  /** Base image count for the generated PNG corpus (every 5th image also
    * gets a perturbed near-dup variant under id+10⁶ — 80 variant pairs). */
  val PngCorpusN = 400L
  private val PngW = 32
  private val PngH = 32
  private val PngVariantIdOffset = 1000000L

  /** Deterministic RGB for pixel (x, y) of image `eff` — pure integer
    * congruences, so the DuckDB oracle regenerates every pixel without any
    * image codec. Variants perturb the red channel inside the 4×4 block at
    * (8..11, 8..11): a localized edit that flips ≤2 dHash bits (measured),
    * leaving ≥1 clean band — the near-dup the gate must find. */
  private def pngPixel(eff: Long, x: Int, y: Int, variant: Boolean): Int = {
    val r0 = ((x * 7 + y * 13 + eff * 31) % 256).toInt
    val r = if (variant && x >= 8 && x < 12 && y >= 8 && y < 12)
      (r0 + 128) % 256 else r0
    val g = ((x * 3 + y * 5 + eff * 17) % 256).toInt
    val b = ((x * 11 + y * 2 + eff * 23) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode one corpus image as PNG bytes (JDK ImageIO — lossless, so the
    * decode side recovers the exact congruence pixels). */
  private[graft] def pngBytes(eff: Long, variant: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(PngW, PngH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < PngH) {
      var x = 0
      while (x < PngW) {
        img.setRGB(x, y, pngPixel(eff, x, y, variant))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The PNG corpus materialized ONCE per JVM as a (doc_id, mime, content)
    * parquet table (MemoTables memo — the gate scans real binary columns
    * like production): [[PngCorpusN]] base images plus a perturbed variant
    * of every 5th, encoded distributed (one `mapPartitions` over the id
    * range). */
  def pngCorpusTable(spark: SparkSession): String =
    MemoTables.dir(s"pngcorpus|$PngCorpusN", "graft-pngcorpus") { dir =>
      import spark.implicits._
      val ids = spark.range(PngCorpusN).select(col("id"))
        .unionByName(spark.range(PngCorpusN).filter(col("id") % 5 === 0)
          .select((col("id") + PngVariantIdOffset).as("id")))
      ids.as[Long].mapPartitions(_.map { id =>
        val variant = id >= PngVariantIdOffset
        Media(id, "image/png", pngBytes(id % PngVariantIdOffset, variant))
      }).toDF().write.mode("overwrite").parquet(dir)
    }

  /** Perceptual near-dup over the generated PNG corpus with the REAL
    * [[dhashImage]] decode — no byte stub anywhere on this path: payloads
    * are actual PNGs, ImageIO decodes them, and the 9×8 integer luma grid
    * produces the signature. Hash-verified end-to-end because the corpus
    * pixels are congruence-generated: the oracle rebuilds every pixel in
    * SQL, aggregates the identical integer grid, and replays the same
    * banding + hamming join ([[pngNearDupOracleSql]]). Same operator as
    * `mm_near_dup` ([[nearDupMediaPairs]]) — only the corpus and the
    * decoder differ. */
  def pngNearDup(spark: SparkSession, sfDirIgnored: String,
      maxHamming: Int = 6): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(pngCorpusTable(spark)).as[Media]
    nearDupMediaPairs(media, maxHamming, sig = dhashImage)
  }

  /** DuckDB twin of [[pngNearDup]]: congruence pixels → integer luma →
    * 9×8 floor-average grid (the same `y·8 div 32` / `x·9 div 32` cell
    * mapping — no clamp needed at 32×32) → gradient bits (bit j = r·8+c,
    * j < 63) → 16-bit band join → hamming ≤ cap. */
  def pngNearDupOracleSql(maxHamming: Int = 6): String =
    s"""WITH ${pngNearDupCtes(maxHamming)}
       |SELECT id1, id2, hamming FROM imgpairs
       |ORDER BY id1, id2""".stripMargin

  /** The [[pngNearDupOracleSql]] pipeline as a reusable CTE list ending in
    * `imgpairs(id1, id2, hamming)` — shared with
    * [[crossModalConsensusOracleSql]], so the consensus oracle derives the
    * image tier from the same congruence-pixel chain the image gate is
    * verified by. */
  private[operators] def pngNearDupCtes(maxHamming: Int = 6): String = {
    def chan(mulX: Int, mulY: Int, mulId: Int) =
      s"(x.v * $mulX + y.v * $mulY + eff * $mulId) % 256"
    val rExpr = s"CASE WHEN var AND x.v BETWEEN 8 AND 11 AND y.v BETWEEN 8 AND 11 " +
      s"THEN (${chan(7, 13, 31)} + 128) % 256 ELSE ${chan(7, 13, 31)} END"
    s"""ids AS (
       |  SELECT i AS id, i AS eff, FALSE AS var FROM range($PngCorpusN) t(i)
       |  UNION ALL
       |  SELECT i + $PngVariantIdOffset, i, TRUE FROM range($PngCorpusN) t(i)
       |  WHERE i % 5 = 0
       |), px AS (
       |  SELECT id, y.v * 8 // $PngH AS cy, x.v * 9 // $PngW AS cx,
       |    (299 * ($rExpr) + 587 * (${chan(3, 5, 17)})
       |      + 114 * (${chan(11, 2, 23)})) // 1000 AS luma
       |  FROM ids, range($PngW) x(v), range($PngH) y(v)
       |), cells AS (
       |  SELECT id, cy, cx, sum(luma) // count(*) AS cell
       |  FROM px GROUP BY 1, 2, 3
       |), bits AS (
       |  SELECT a.id, a.cy * 8 + a.cx AS j,
       |    CASE WHEN a.cell < b.cell THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON a.id = b.id AND a.cy = b.cy AND b.cx = a.cx + 1
       |  WHERE a.cx < 8 AND a.cy * 8 + a.cx < 63
       |), isig AS (
       |  SELECT id, CAST(sum(CASE WHEN bit = 1
       |      THEN CAST(1 AS UBIGINT) << CAST(j AS INTEGER)
       |      ELSE CAST(0 AS UBIGINT) END) AS BIGINT) AS sig
       |  FROM bits GROUP BY id
       |), banded AS (
       |  SELECT id, sig, b AS band, (sig >> (16 * b)) & 65535 AS bandsig
       |  FROM isig, range(4) t(b)
       |), imgpairs AS (
       |  SELECT DISTINCT a.id AS id1, b.id AS id2,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bandsig = b.bandsig AND a.id < b.id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |)""".stripMargin
  }

  // ---- cross-modal consensus near-dup --------------------------------------

  /** Deterministic caption assignment for the PNG corpus: item `eff` reads
    * caption `documents[eff % nDocs]`, except every (eff % 7 == 0) VARIANT,
    * whose caption drifts to `(eff + 1) % nDocs` — the caption-rewrite case
    * a real image+caption pipeline sees (same image re-posted with a new
    * caption). The drift rule is pure integer congruence, so the oracle
    * reproduces the corpus without reading the engine's tables. */
  private def capDocCol(nDocs: Long) = {
    val eff = col("doc_id") % PngVariantIdOffset
    when(col("doc_id") >= PngVariantIdOffset && eff % 7 === 0,
      (eff + 1) % nDocs).otherwise(eff % nDocs)
  }

  /** CROSS-MODAL CONSENSUS NEAR-DUP — the agreement rule a production
    * image+caption dedup applies before dropping a pair: the IMAGE tier
    * (the verified [[pngNearDup]] dHash band-join pairs, REAL `imageio`
    * decode) and the CAPTION tier (same caption document, or caption
    * documents that are verified [[Dedup.minhashLsh]] shingle near-dups)
    * vote, and agreement ⇒ `near_dup` (safe to drop), image-only ⇒
    * `review_image` (same image, rewritten caption — maybe legitimate
    * re-use), caption-only ⇒ `review_caption` (same text on different
    * images — template/spam signal). One row per pair in EITHER tier.
    *
    * Scale shape: both input tiers are the already-bounded outputs of
    * their verified gates (banded joins, never all-pairs); the caption
    * match expands items→pairs through three EQUI-joins (same-doc
    * self-join + the two orientations of the doc-pair tier — a union of
    * equi-joins, never an OR-join that would plan a nested loop); the
    * consensus itself is one full-outer join of two pair sets that are
    * orders of magnitude smaller than either corpus. `nDocs` is a 1-row
    * aggregate (bounded-collect class). */
  def crossModalConsensus(spark: SparkSession, sfDir: String,
      maxHamming: Int = 6, threshold: Double = 0.3): DataFrame = {
    val nDocs = documents(spark, sfDir).count()
    val items = spark.read.parquet(pngCorpusTable(spark))
      .select(col("doc_id").as("item_id"), capDocCol(nDocs).as("cap_doc"))
    val img = pngNearDup(spark, sfDir, maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
    val txt = Dedup.minhashLsh(spark, sfDir, threshold)
      .select(col("id1").as("d1"), col("id2").as("d2"))
    val ia = items.select(col("item_id").as("ia"), col("cap_doc").as("ca"))
    val ib = items.select(col("item_id").as("ib"), col("cap_doc").as("cb"))
    // caption-match pairs: identical caption doc …
    val sameDoc = ia.join(ib, col("ca") === col("cb") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
    // … or caption docs that are LSH near-dups (both orientations of the
    // d1 < d2 pair tier; disjoint from sameDoc since d1 <> d2)
    val viaLsh = ia.join(txt, col("ca") === col("d1"))
        .join(ib, col("cb") === col("d2"))
      .unionByName(ia.join(txt, col("ca") === col("d2"))
        .join(ib, col("cb") === col("d1")))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
    val capMatch = sameDoc.unionByName(viaLsh)
      .select(col("ia").as("id1"), col("ib").as("id2"),
        lit(true).as("cap_match"))
    img.join(capMatch, Seq("id1", "id2"), "full_outer")
      .select(col("id1"), col("id2"), col("hamming"),
        coalesce(col("cap_match"), lit(false)).as("cap_match"),
        when(col("hamming").isNotNull && col("cap_match").isNotNull
            && col("cap_match"), lit("near_dup"))
          .when(col("hamming").isNotNull, lit("review_image"))
          .otherwise(lit("review_caption")).as("tier"))
      .orderBy(col("id1"), col("id2"))
  }

  /** DuckDB twin of [[crossModalConsensus]] — the image tier from
    * [[pngNearDupCtes]] (congruence pixels, no codec), the caption tier
    * from [[Dedup.minhashCtes]] (the verified shingle chain over
    * `documents`), the same congruence caption assignment, and the same
    * full-outer tier labels. */
  def crossModalConsensusOracleSql(maxHamming: Int = 6,
      threshold: Double = 0.3): String =
    s"""WITH ${pngNearDupCtes(maxHamming)},
       |${Dedup.minhashCtes(threshold)},
       |txt AS (
       |  SELECT e.id1 AS d1, e.id2 AS d2
       |  FROM est e JOIN jac j ON e.id1 = j.id1 AND e.id2 = j.id2
       |  WHERE j.jaccard >= $threshold
       |), nd AS (
       |  SELECT count(*) AS n FROM documents
       |), cap AS (
       |  SELECT id AS item_id,
       |    CASE WHEN var AND eff % 7 = 0 THEN (eff + 1) % nd.n
       |         ELSE eff % nd.n END AS cap_doc
       |  FROM ids, nd
       |), capm AS (
       |  SELECT a.item_id AS id1, b.item_id AS id2
       |  FROM cap a JOIN cap b ON a.item_id < b.item_id
       |  WHERE a.cap_doc = b.cap_doc
       |     OR EXISTS (SELECT 1 FROM txt
       |          WHERE (d1 = a.cap_doc AND d2 = b.cap_doc)
       |             OR (d1 = b.cap_doc AND d2 = a.cap_doc))
       |)
       |SELECT coalesce(i.id1, c.id1) AS id1, coalesce(i.id2, c.id2) AS id2,
       |  i.hamming, c.id1 IS NOT NULL AS cap_match,
       |  CASE WHEN i.id1 IS NOT NULL AND c.id1 IS NOT NULL THEN 'near_dup'
       |       WHEN i.id1 IS NOT NULL THEN 'review_image'
       |       ELSE 'review_caption' END AS tier
       |FROM imgpairs i FULL OUTER JOIN capm c
       |  ON i.id1 = c.id1 AND i.id2 = c.id2
       |ORDER BY 1, 2""".stripMargin
}
