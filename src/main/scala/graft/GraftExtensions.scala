package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.codecs

/** SparkSessionExtensions injection point: registers the engine's native
  * expressions under SQL names so `spark.sql` users get the full surface:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT graft_hb_client_id(frame) FROM frames")
  * }}}
  *
  * Functions: graft_le_u16(bin, off), graft_le_i64(bin, off),
  * graft_frame_split(bin), graft_frame_type(bin), graft_frame_len(bin),
  * graft_hb_client_id/sequence/timestamp(bin); vector math
  * graft_dot/graft_cosine/graft_l2sq(arr, arr),
  * graft_hyperplane_sig(arr, bits); text kernels
  * graft_word_shingles(str, n), graft_minhash_sig(arr, k),
  * graft_simhash64(arr), graft_pii_scrub(str), graft_token_entropy(str),
  * graft_word_counts(str), graft_normalize_text(str),
  * graft_cdc_chunks(str, w), graft_pcm_frames(bin, n),
  * graft_pcm16_frames(bin, nSamples),
  * graft_max_line_len(str), graft_warc_split(str); split assignment
  * graft_split(id); sampling
  * key graft_uniform(id).
  *
  * Table functions (`SELECT * FROM graft_...`): graft_ivf_train /
  * graft_ivf_probe — the ANN train-once / probe-many serve path from
  * pure SQL; graft_asof — the native as-of merge (all four directions);
  * graft_dedup_exact / graft_decontaminate — the exact-dedup and
  * benchmark-decontamination passes for pure-SQL users (see
  * [[GraftExtensions.tableFunctions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
      )
    }
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      ext.injectTableFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
      )
    }
    // custom physical operators (native as-of join merge)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def off(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"offset must be an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_le_u16" -> (es => codecs.LeU16(es(0), off(es(1)))),
    "graft_le_i64" -> (es => codecs.LeI64(es(0), off(es(1)))),
    "graft_frame_split" -> (es => codecs.FrameSplit(es(0))),
    "graft_frame_type" -> (es => codecs.LeU16(es(0), graft.model.Telemetry.LengthPrefixSize)),
    "graft_frame_len" -> (es => codecs.LeU16(es(0), 0)),
    "graft_hb_client_id" -> (es => codecs.LeI64(es(0), graft.model.Telemetry.HeaderSize)),
    "graft_hb_sequence" -> (es => codecs.LeI64(es(0), graft.model.Telemetry.HeaderSize + 8)),
    "graft_hb_timestamp" -> (es => codecs.LeI64(es(0), graft.model.Telemetry.HeaderSize + 16)),
    "graft_dot" -> (es => graft.functions.vector.DotProduct(es(0), es(1))),
    "graft_cosine" -> (es => graft.functions.vector.CosineSim(es(0), es(1))),
    "graft_l2sq" -> (es => graft.functions.vector.L2Sq(es(0), es(1))),
    "graft_hyperplane_sig" -> (es => graft.functions.vector.HyperplaneSig(es(0), off(es(1)))),
    "graft_word_shingles" -> (es => graft.functions.text.WordShingles(es(0), off(es(1)))),
    "graft_minhash_sig" -> (es => graft.functions.text.MinHashSig(es(0), off(es(1)))),
    "graft_simhash64" -> (es => graft.functions.text.SimHash64(es(0))),
    // deterministic train/val/test assignment (CorpusOps.hashSplit's tree)
    "graft_split" -> (es => graft.operators.CorpusOps.splitExpr(es(0))),
    // deterministic uniform-[0,1) sampling key (CorpusOps.hashUniform's
    // tree): WHERE graft_uniform(id) < rate
    "graft_uniform" -> (es => graft.operators.CorpusOps.uniformExpr(es(0))),
    // fused PII audit+redaction: SELECT graft_pii_scrub(text).* gives
    // (n_emails, n_ips, n_phones, redacted) in one native pass
    "graft_pii_scrub" -> (es => graft.functions.text.PiiScrub(es(0))),
    // token-distribution entropy: SELECT graft_token_entropy(text).*
    // gives (n_tokens, entropy) in one zero-shuffle native pass
    "graft_token_entropy" -> (es => graft.functions.text.TokenEntropy(es(0))),
    // per-row term counts: SELECT explode(graft_word_counts(text)) —
    // the (doc, term, tf) table without a (doc,term) exchange
    "graft_word_counts" -> (es => graft.functions.text.WordCounts(es(0))),
    // canonical dedup-key normalization (lowercase, collapse whitespace
    // runs, trim) in one native byte walk — md5(graft_normalize_text(t))
    // is the corpus digest key
    "graft_normalize_text" -> (es => graft.functions.text.NormalizeText(es(0))),
    // content-defined chunking: SELECT doc_id, explode(graft_cdc_chunks(text, 8))
    "graft_cdc_chunks" -> (es => graft.functions.text.CdcChunks(es(0), off(es(1)))),
    // per-frame PCM features over a binary byte plane:
    // SELECT doc_id, explode(graft_pcm_frames(content, 8))
    "graft_pcm_frames" -> (es => graft.functions.codecs.PcmFrames(es(0), off(es(1)))),
    // signed-LE16 twin (frameSize counts samples) — decoded-WAV planes
    "graft_pcm16_frames" -> (es => graft.functions.codecs.Pcm16Frames(es(0), off(es(1)))),
    // longest \n-separated line in chars, one codegen byte pass
    "graft_max_line_len" -> (es => graft.functions.text.MaxLineLen(es(0))),
    // WARC-lite framing: SELECT posexplode(graft_warc_split(blob))
    "graft_warc_split" -> (es => graft.functions.text.WarcSplit(es(0)))
  )

  private def str(e: Expression): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other =>
      throw new IllegalArgumentException(s"expected a string literal (table/column name), got $other")
  }

  /** SQL TABLE functions: the IVF train-once / probe-many serve path from
    * pure SQL, mirroring the Scala API
    * ([[graft.operators.Similarity.ivfTrain]]/`ivfProbe`):
    *
    * {{{
    * CREATE TEMP VIEW cents AS
    *   SELECT * FROM graft_ivf_train('embeddings', 'embedding', 'vec_id', 16, 2);
    * SELECT * FROM graft_ivf_probe('cents', 'embeddings', 'queries',
    *                               'embedding', 'vec_id', 5, 4);
    * }}}
    *
    * Table/column arguments are string literals resolved against the
    * session catalog (temp views included). Like the Scala path, the
    * centroid table is collected into a plan literal at analysis time —
    * nlist×dim KBs, the price of shuffle-free cell assignment.
    */
  val tableFunctions: Seq[(String, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    "graft_ivf_train" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      graft.operators.Similarity
        .ivfTrain(
          spark.table(str(es(0))),
          vec = str(es(1)),
          id = str(es(2)),
          nlist = if (es.length > 3) off(es(3)) else 16,
          iters = if (es.length > 4) off(es(4)) else 2
        )
        .queryExecution.logical
    }),
    "graft_ivf_probe" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      graft.operators.Similarity
        .ivfProbe(
          centroids = spark.table(str(es(0))),
          corpus = spark.table(str(es(1))),
          queries = spark.table(str(es(2))),
          vec = str(es(3)),
          id = str(es(4)),
          k = off(es(5)),
          nprobe = if (es.length > 6) off(es(6)) else 4
        )
        .queryExecution.logical
    }),
    // native as-of join from SQL:
    //   SELECT * FROM graft_asof('left_view', 'right_view', 'key', 'ts')
    //   SELECT * FROM graft_asof('l', 'r', 'k', 't', 'forward')
    //   SELECT * FROM graft_asof('l', 'r', 'k', 't', 'backward_chunked')
    // routes through the AsOfJoinExec physical merge (q19's operator);
    // the *_chunked directions take the monster-key time-epoch path
    "graft_asof" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      val l = spark.table(str(es(0)))
      val r = spark.table(str(es(1)))
      val (by, t) = (str(es(2)), str(es(3)))
      val out = (if (es.length > 4) str(es(4)) else "backward") match {
        case "backward" => graft.operators.AsOfJoin.asofBackwardNative(l, r, by, t)
        case "forward" => graft.operators.AsOfJoin.asofForward(l, r, by, t)
        case "backward_chunked" => graft.operators.AsOfJoin.asofBackwardChunked(l, r, by, t)
        case "forward_chunked" => graft.operators.AsOfJoin.asofForwardChunked(l, r, by, t)
        case other =>
          throw new IllegalArgumentException(
            s"direction must be backward|forward|backward_chunked|forward_chunked, got '$other'"
          )
      }
      out.queryExecution.logical
    }),
    // exact dedup from SQL (the x1 plan verbatim — digests-only exchange):
    //   SELECT * FROM graft_dedup_exact('docs', 'text', 'doc_id')
    // one row per distinct normalized digest: (fp, keep_id, n_copies)
    "graft_dedup_exact" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.col
      graft.operators.Dedup
        .exact(spark.table(str(es(0))), col(str(es(1))), col(str(es(2))))
        .queryExecution.logical
    }),
    // typed media catalog from SQL (the x184 plan: magic-sniff + decode
    // just enough to type each blob, zero-shuffle mapPartitions):
    //   SELECT * FROM graft_media_probe('media', 'doc_id', 'content')
    // one row per blob: (doc_id, kind, byte_len, width, height,
    // n_frames, sample_rate, n_samples)
    "graft_media_probe" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.{col, lit}
      val ds = spark
        .table(str(es(0)))
        .select(
          col(str(es(1))).cast("long").as("doc_id"),
          lit("sql").as("media_type"),
          col(str(es(2))).as("content")
        )
        .as(org.apache.spark.sql.Encoders.product[graft.operators.Multimodal.MediaRow])
      graft.operators.Multimodal.mediaProbe(ds).queryExecution.logical
    }),
    // the CAPSTONE media pipeline from SQL (the x187 plan: one decode
    // pass types + fingerprints, kind-routed near-dup, CC keep-best):
    //   SELECT * FROM graft_media_dedup('media', 'doc_id', 'content'[, normalizeRate])
    // one row per blob: the graft_media_probe columns + kept + n_members
    "graft_media_dedup" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.{col, lit}
      val ds = spark
        .table(str(es(0)))
        .select(
          col(str(es(1))).cast("long").as("doc_id"),
          lit("sql").as("media_type"),
          col(str(es(2))).as("content")
        )
        .as(org.apache.spark.sql.Encoders.product[graft.operators.Multimodal.MediaRow])
      val rate = if (es.length > 3) Some(off(es(3))) else None
      graft.operators.Multimodal
        .mediaDedupCatalog(ds, normalizeRate = rate)
        .queryExecution.logical
    }),
    // per-frame video hashes from SQL (GIF / Y4M / MJPEG-AVI decode +
    // classic 8x8 aHash; non-video blobs take the raw block fallback):
    //   SELECT * FROM graft_video_frames('media', 'doc_id', 'content'[, stride])
    // one row per sampled frame: (doc_id, frame_idx, width, height, simhash)
    "graft_video_frames" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.{col, lit}
      val ds = spark
        .table(str(es(0)))
        .select(
          col(str(es(1))).cast("long").as("doc_id"),
          lit("sql").as("media_type"),
          col(str(es(2))).as("content")
        )
        .as(org.apache.spark.sql.Encoders.product[graft.operators.Multimodal.MediaRow])
      graft.operators.Multimodal
        .videoFrameHashes(ds, stride = if (es.length > 3) off(es(3)) else 1)
        .queryExecution.logical
    }),
    // benchmark decontamination from SQL (the x24 plan: corpus n-gram
    // explode equi-joined to the BROADCAST benchmark gram set):
    //   SELECT * FROM graft_decontaminate('corpus', 'text', 'doc_id',
    //                                     'bench', 'text', 'bench_id'[, n])
    // one row per contaminated corpus doc: (doc_id, bench_id, n_hits)
    "graft_decontaminate" -> (es => {
      val spark = org.apache.spark.sql.SparkSession.active
      import org.apache.spark.sql.functions.col
      graft.operators.CorpusOps
        .decontaminate(
          spark.table(str(es(0))),
          col(str(es(1))),
          col(str(es(2))),
          spark.table(str(es(3))),
          col(str(es(4))),
          col(str(es(5))),
          n = if (es.length > 6) off(es(6)) else 8
        )
        .queryExecution.logical
    })
  )

  /** Register into an already-running session (the builder-time path is
    * `withExtensions(new GraftExtensions)`; this covers sessions you don't
    * construct, e.g. notebook/shell environments).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    tableFunctions.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
