package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over `documents` and
  * `embeddings`: deduplication (exact / fingerprint / MinHash-LSH / SimHash
  * / n-gram Jaccard / embedding cosine), similarity search (brute-force
  * top-k, LSH-bucketed ANN), and text analysis (token stats, quality
  * scoring, fingerprinting, language ID).
  *
  * Cross-engine hashing: Spark's xxhash64 has no DuckDB twin, so every
  * hash here is an explicit polynomial fold ((acc·31 + code) mod P) built
  * from higher-order array functions — identical integer arithmetic in
  * both engines, and in Spark it stays inside codegen (no UDFs).
  *
  * Note Spark's `split(s, '')` keeps a trailing '' (Java regex, limit -1)
  * while DuckDB's `string_split(s, '')` does not — char folds filter it.
  */
object Pipeline
  extends PipelineTextPart
  with PipelineEmbedPart
  with PipelineMediaPart
  with PipelineWebPart
  with PipelineLakehousePart
  with PipelineColumnarPart
  with PipelineTensorPart
  with PipelineDocPart {
  final val P = 1000000007L
  /** documents with the native poly_hash function registered. */
  private[graft] def registered(s: SparkSession, dir: String): DataFrame = {
    graft.functions.PolyHash.register(s)
    graft.functions.PolyHashWindows.register(s)
    graft.functions.JaccardSorted.register(s)
    graft.functions.MinHashSig.register(s)
    graft.functions.SimHashSig.register(s)
    graft.functions.NfcNormalize.register(s)
    Tables.documents(s, dir)
  }
  /** Shared `(doc_id, term) → tf` table — ONE token-explode +
    * map-side-combined aggregate serving the whole retrieval family
    * (tfidf_terms, inverted_index, token_pmi's df/presence,
    * vocab_coverage's unigram counts). ScanCached per (session, dir):
    * the r8 bench showed this chain re-deriving per query
    * (token_pmi 3.9 s, tfidf_terms 3.6 s at sf0.1 — all explode cost).
    * First touch is billed separately by Bench's cold accounting. */
  private[graft] def docTermTf(s: SparkSession, dir: String): DataFrame =
    ScanCache.get(s, s"doc-term-tf:$dir") {
      // spread before the token explode (the vecs move): the split +
      // explode otherwise runs in the scan's one task
      registered(s, dir).repartition(col("doc_id"))
        .selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    }
  /** embeddings with the native dot_p function registered. */
  private[graft] def registeredVecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    Tables.embeddings(s, dir)
  }
  /** Polynomial hash of a string column (Spark side): the native
    * codegen'd expression functions.PolyHash — byte-fold identical to the
    * portable char fold for ASCII corpora (the DuckDB oracle keeps the
    * char-fold form). */
  private[graft] def charFold(colName: String): String = s"poly_hash($colName)"
  /** Shingle start indices 1..size-2, EMPTY for <3 tokens. Spark's
    * sequence(1, n) with n < 1 generates a DESCENDING [1, 0, ...] (and
    * element_at(, 0) then throws), while the DuckDB oracle's
    * range(1, len-1) yields an empty list — so clamp the upper bound to 1
    * and filter out-of-range indices away. */
  private[graft] def shingleIdx(tk: String): String =
    s"filter(sequence(1, greatest(size($tk) - 2, 1)), " +
      s"i -> i <= size($tk) - 2)"
  /** Same fold in DuckDB SQL. */
  private[graft] def charFoldDuck(colName: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($colName, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $P)"
  /** Signature-keyed once-per-corpus fixture directory under the JVM
    * temp dir (the warcFixtureDir pattern, generalized for the
    * CSV/JSONL/ORC source fixtures): `build` runs once per corpus
    * identity; the marker makes it idempotent; the key folds the
    * source table's recursive (length + mtime) signature so a
    * driver-side testdata regeneration invalidates the fixture. */
  /** Count of fixture trees actually BUILT this JVM (cache hits do
    * not count) — Bench reads the delta around each query to report
    * the one-off build cost under first_touch instead of billing it
    * to the query's steady-state time (r11 verdict #3: doc_ingest_dag
    * was 22 s with the 12 500-file tree build inside the timed run). */
  private[graft] val fixtureBuilds =
    new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] def formatFixtureDir(dir: String, tag: String, table: String)(
      build: String => Unit): String = {
    def sig(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(sig).sum
      else f.length() + f.lastModified()
    val ident = s"$dir:${sig(new java.io.File(s"$dir/$table.parquet"))}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_${tag}_$key")
    val marker = new java.io.File(root, "_GRAFT_READY")
    if (!marker.exists()) Pipeline.synchronized {
      if (!marker.exists()) {
        root.mkdirs()
        build(root.getAbsolutePath)
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
        fixtureBuilds.incrementAndGet(): Unit
      }
    }
    root.getAbsolutePath
  }
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lang_id"             -> langId _,
    "lang_confusion"      -> langConfusion _,
    "knn_label_acc"       -> knnLabelAcc _,
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_decode_bmp" -> multimodalDecodeBmp _,
    "image_ahash"       -> imageAhash _,
    "image_neardup_ahash" -> imageNeardupAhash _,
    "image_neardup_recall" -> imageNeardupRecall _,
    "multimodal_decode_jpeg" -> multimodalDecodeJpeg _,
    "multimodal_decode_png" -> multimodalDecodePng _,
    "multimodal_decode_gif" -> multimodalDecodeGif _,
    "multimodal_decode_tiff" -> multimodalDecodeTiff _,
    "multimodal_decode_png_pixels" -> multimodalDecodePngPixels _,
    "multimodal_decode_png_adam7" -> multimodalDecodePngAdam7 _,
    "multimodal_decode_gif_pixels" -> multimodalDecodeGifPixels _,
    "multimodal_decode_tiff_pixels" -> multimodalDecodeTiffPixels _,
    "multimodal_decode_jpeg_pixels" -> multimodalDecodeJpegPixels _,
    "multimodal_decode_jpeg_progressive" -> multimodalDecodeJpegProgressive _,
    "multimodal_decode_mp3" -> multimodalDecodeMp3 _,
    "multimodal_decode_mp1" -> multimodalDecodeMp1 _,
    "multimodal_decode_mp2" -> multimodalDecodeMp2 _,
    "multimodal_decode_h264" -> multimodalDecodeH264 _,
    "multimodal_decode_h264_pixels" -> multimodalDecodeH264Pixels _,
    "content_sniff" -> contentSniff _,
    "cdc_chunks"        -> cdcChunks _,
    "cdc_dedup"         -> cdcDedup _,
    "cdc_delta"         -> cdcDelta _,
    "multimodal_decode_mp4" -> multimodalDecodeMp4 _,
    "multimodal_decode_wav" -> multimodalDecodeWav _,
    "multimodal_decode_ulaw" -> multimodalDecodeUlaw _,
    "multimodal_decode_alaw" -> multimodalDecodeAlaw _,
    "image_resize_box" -> imageResizeBox _,
    "multimodal_exif_orientation" -> multimodalExifOrientation _,
    "multimodal_id3_tags" -> multimodalId3Tags _,
    "audio_frame_energy" -> audioFrameEnergy _,
    "audio_vad_segments" -> audioVadSegments _,
    "multimodal_decode_flac" -> multimodalDecodeFlac _,
    "ogg_parse"         -> oggParse _,
    "ogg_opus_meta"     -> oggOpusMeta _,
    "multimodal_decode_png_types" -> multimodalDecodePngTypes _,
    "media_ingest_dag"  -> mediaIngestDag _,
    "media_ingest_files" -> mediaIngestFiles _,
    "image_quality_gate" -> imageQualityGate _,
    "multimodal_gif_frames" -> multimodalGifFrames _,
    "video_frame_sample" -> videoFrameSample _,
    "video_shot_cuts"   -> videoShotCuts _,
    "srt_parse"         -> srtParse _,
    "vtt_parse"         -> vttParse _,
    "y4m_frame_stats"   -> y4mFrameStats _,
    "caption_scene_align" -> captionSceneAlign _,
    "html_extract" -> htmlExtract _,
    "audio_resample" -> audioResample _,
    "multimodal_decode_tiff_packbits" -> multimodalDecodeTiffPackbits _,
    "multimodal_decode_qoi_pixels" -> multimodalDecodeQoiPixels _,
    "multimodal_decode_tiff_lzw" -> multimodalDecodeTiffLzw _,
    "multimodal_decode_webp" -> multimodalDecodeWebp _,
    "multimodal_decode_webp_pixels" -> multimodalDecodeWebpPixels _,
    "url_normalize" -> urlNormalize _,
    "url_host_counts" -> urlHostCounts _,
    "url_surt"          -> urlSurt _,
    "robots_decisions"  -> robotsDecisions _,
    "crawl_frontier"    -> crawlFrontier _,
    "polite_schedule"   -> politeSchedule _,
    "crawl_schedule"    -> crawlSchedule _,
    "sitemap_parse"     -> sitemapParse _,
    "crawl_loop_sitemap" -> crawlLoopSitemap _,
    "span_corrupt"      -> spanCorrupt _,
    "fim_transform"     -> fimTransform _,
    "mlm_mask"          -> mlmMask _,
    "line_dedup"        -> lineDedup _,
    "line_boilerplate"  -> lineBoilerplate _,
    "warc_parse"        -> warcParsePlain _,
    "warc_cdx"          -> warcCdx _,
    "warc_parse_gzip"   -> warcParseGzip _,
    "warc_parse_zst"    -> warcParseZst _,
    "warc_parse_files"  -> warcParseFiles _,
    "tar_parse"         -> tarParse _,
    "tar_parse_gz"      -> tarParseGz _,
    "tar_parse_lz4"     -> tarParseLz4 _,
    "tar_parse_snappy"  -> tarParseSnappy _,
    "tar_parse_bz2"     -> tarParseBz2 _,
    "tar_parse_zst"     -> tarParseZst _,
    "tar_parse_xz"      -> tarParseXz _,
    "tar_parse_files"   -> tarParseFiles _,
    "avro_parse"        -> avroParse _,
    "avro_parse_nested" -> avroParseNested _,
    "avro_parse_codecs" -> avroParseCodecs _,
    "arrow_ipc_parse"   -> arrowIpcParse _,
    "arrow_ipc_files"   -> arrowIpcFiles _,
    "arrow_ipc_nested"  -> arrowIpcNested _,
    "arrow_ipc_map"     -> arrowIpcMap _,
    "arrow_ipc_union"   -> arrowIpcUnion _,
    "arrow_ipc_dict"    -> arrowIpcDict _,
    "arrow_ipc_compressed" -> arrowIpcCompressed _,
    "arrow_ipc_embeddings" -> arrowIpcEmbeddings _,
    "arrow_ipc_temporal" -> arrowIpcTemporal _,
    "safetensors_parse" -> safetensorsParse _,
    "npy_parse"         -> npyParse _,
    "npy_structured"    -> npyStructured _,
    "npz_parse"         -> npzParse _,
    "gguf_parse"        -> ggufParse _,
    "tensor_source_read" -> tensorSourceRead _,
    "zarr_read"         -> zarrRead _,
    "zarr3_read"        -> zarr3Read _,
    "onnx_parse"        -> onnxParse _,
    "parquet_write_roundtrip" -> parquetWriteRoundtrip _,
    "parquet_write_nested" -> parquetWriteNested _,
    "parquet_write_split" -> parquetWriteSplit _,
    "parquet_write_rich" -> parquetWriteRich _,
    "parquet_write_struct" -> parquetWriteStruct _,
    "orc_write_struct" -> orcWriteStruct _,
    "parquet_write_deep" -> parquetWriteDeep _,
    "orc_write_deep" -> orcWriteDeep _,
    "orc_write_roundtrip" -> orcWriteRoundtrip _,
    "orc_write_rich" -> orcWriteRich _,
    "orc_write_nested" -> orcWriteNested _,
    "parquet_raw_source" -> parquetRawSource _,
    "parquet_raw_nested" -> parquetRawNested _,
    "parquet_footer"    -> parquetFooter _,
    "parquet_page_index" -> parquetPageIndex _,
    "parquet_data_decode" -> parquetDataDecode _,
    "parquet_list_decode" -> parquetListDecode _,
    "wikidump_parse"    -> wikidumpParse _,
    "columnar_struct_decode" -> columnarStructDecode _,
    "columnar_nested_decode" -> columnarNestedDecode _,
    "orc_data_decode"   -> orcDataDecode _,
    "orc_list_decode"   -> orcListDecode _,
    "parquet_bloom_probe" -> parquetBloomProbe _,
    "orc_footer"        -> orcFooter _,
    "orc_row_index"     -> orcRowIndex _,
    "hudi_snapshot"     -> hudiSnapshot _,
    "hudi_mor_snapshot" -> hudiMorSnapshot _,
    "hudi_mor_parquet_log" -> hudiMorParquetLog _,
    "hudi_mor_hfile_log" -> hudiMorHFileLog _,
    "hdf5_parse"        -> hdf5Parse _,
    "hdf5_parse_deep"   -> hdf5ParseDeep _,
    "hdf5_parse_files"  -> hdf5ParseFiles _,
    "tensor_cross_check" -> tensorCrossCheck _,
    "delta_scan"        -> deltaScan _,
    "delta_cdf_scan"    -> deltaCdfScan _,
    "delta_time_travel" -> deltaTimeTravel _,
    "delta_dv_scan"     -> deltaDvScan _,
    "delta_column_mapping" -> deltaColumnMapping _,
    "delta_column_mapping_id" -> deltaColumnMappingId _,
    "delta_checkpoint_v2" -> deltaCheckpointV2 _,
    "iceberg_scan"      -> icebergScan _,
    "iceberg_manifest_prune" -> icebergManifestPrune _,
    "iceberg_files_meta" -> icebergFilesMeta _,
    "iceberg_avro_scan" -> icebergAvroScan _,
    "iceberg_time_travel" -> icebergTimeTravel _,
    "iceberg_partition_prune" -> icebergPartitionPrune _,
    "iceberg_pos_delete" -> icebergPosDelete _,
    "iceberg_dv_scan"   -> icebergDvScan _,
    "iceberg_eq_delete" -> icebergEqDelete _,
    "iceberg_map_type"  -> icebergMapType _,
    "lakehouse_ingest_dag" -> lakehouseIngestDag _,
    "arrow_source_read" -> arrowSourceRead _,
    "avro_source_read"  -> avroSourceRead _,
    "arrow_sink_roundtrip" -> arrowSinkRoundtrip _,
    "avro_sink_roundtrip"  -> avroSinkRoundtrip _,
    "avro_parse_files"  -> avroParseFiles _,
    "zip_parse"         -> zipParse _,
    "sevenz_parse"      -> sevenzParse _,
    "eml_parse"         -> emlParse _,
    "doc_ingest_dag"    -> docIngestDag _,
    "zip_parse_files"   -> zipParseFiles _,
    "tfrecord_parse"    -> tfrecordParse _,
    "tfrecord_parse_files" -> tfrecordParseFiles _,
    "tfexample_parse"   -> tfexampleParse _,
    "tfsequence_parse"  -> tfsequenceParse _,
    "text_fix_encoding" -> textFixEncoding _,
    "csv_ingest"        -> csvIngest _,
    "hist_file_rollup"  -> histFileRollup _,
    "jsonl_ingest"      -> jsonlIngest _,
    "jsonl_zst_ingest"  -> jsonlZstIngest _,
    "jsonl_zst_files"   -> jsonlZstFiles _,
    "jsonl_zst_write"   -> jsonlZstWrite _,
    "jsonl_xz_write"    -> jsonlXzWrite _,
    "msgpack_parse"     -> msgpackParse _,
    "cbor_parse"        -> cborParse _,
    "bson_parse"        -> bsonParse _,
    "sqlite_parse"      -> sqliteParse _,
    "sqlite_parse_wr"   -> sqliteParseWr _,
    "feed_parse"        -> feedParse _,
    "wet_wat_extract"   -> wetWatExtract _,
    "epub_text_extract" -> epubTextExtract _,
    "docx_text_extract" -> docxTextExtract _,
    "xlsx_extract"      -> xlsxExtract _,
    "pdf_text_extract"  -> pdfTextExtract _,
    "orc_roundtrip"     -> orcRoundtrip _,
    "webdataset_pairs"  -> webdatasetPairs _,
    "web_ingest_dag"    -> webIngestDag _,
    "unigram_vocab"     -> unigramVocab _,
    "unigram_encode"    -> unigramEncode _,
    "unigram_doc_tokens" -> unigramDocTokens _,
    "embedding_covariance" -> embeddingCovariance _,
    "embedding_top_eig" -> embeddingTopEig _,
    "embedding_eig2"    -> embeddingEig2 _,
    "embedding_project2" -> embeddingProject2 _,
    "wordpiece_encode"  -> wordpieceEncode _,
    "wordpiece_doc_tokens" -> wordpieceDocTokens _,
    "dedup_exact"       -> dedupExact _,
    "dedup_clusters"    -> dedupClusters _,
    "dedup_keep_best"   -> dedupKeepBest _,
    "sample_hash"       -> sampleHash _,
    "sample_balanced"   -> sampleBalanced _,
    "sample_weighted"   -> sampleWeighted _,
    "token_pmi"         -> tokenPmi _,
    "dedup_incremental" -> dedupIncremental _,
    "inverted_index"    -> invertedIndex _,
    "source_kl"         -> sourceKl _,
    "containment_pairs" -> containmentPairs _,
    "embedding_q8"      -> embeddingQ8 _,
    "embedding_pq"      -> embeddingPq _,
    "corpus_split"      -> corpusSplit _,
    "corpus_report"     -> corpusReport _,
    "quantile_sketch"   -> quantileSketch _,
    "embedding_rp"      -> embeddingRp _,
    "boilerplate_ngrams" -> boilerplateNgrams _,
    "token_stats"       -> tokenStats _,
    "text_quality"      -> textQuality _,
    "char_entropy"      -> charEntropy _,
    "doc_fingerprint"   -> docFingerprint _,
    "embedding_topk"    -> embeddingTopk _,
    "embedding_neardup" -> embeddingNeardup _,
    "minhash_lsh"       -> minhashLsh _,
    "minhash_recall"    -> minhashRecall _,
    "simhash"           -> simhash _,
    "ngram_jaccard"     -> ngramJaccard _,
    "ann_lsh"           -> annLsh _,
    "ann_lsh_multi"     -> annLshMulti _,
    "ann_recall"        -> annRecall _,
    "embedding_neardup_lsh" -> embeddingNeardupLsh _,
    "embedding_neardup_recall" -> embeddingNeardupRecall _,
    "frame_sample"      -> frameSampleQ _,
    "simhash_neardup"   -> simhashNeardup _,
    "ann_ivf"           -> annIvf _,
    "ann_ivf_trained"   -> annIvfTrained _,
    "ann_ivfpq"         -> annIvfPq _,
    "token_stats_bpe"   -> tokenStatsBpe _,
    "kmv_distinct"      -> kmvDistinct _,
    "cms_heavy_hitters" -> cmsHeavyHitters _,
    "bloom_dedup"       -> bloomDedup _,
    "tfidf_terms"       -> tfidfTerms _,
    "source_overlap"    -> sourceOverlap _,
    "vocab_coverage"    -> vocabCoverage _,
    "text_normalize"    -> textNormalize _,
    "text_quality_full" -> textQualityFull _,
    "winnow_fingerprint" -> winnowFingerprint _,
    "bm25"              -> bm25 _,
    "rrf_fusion"        -> rrfFusion _,
    "bigram_lm"         -> bigramLm _,
    "bigram_lm_heldout" -> bigramLmHeldout _,
    "quality_classifier" -> qualityClassifier _,
    "classifier_calibration" -> classifierCalibration _,
    "dedup_funnel"      -> dedupFunnel _,
    "webdataset_export" -> webdatasetExport _,
    "length_bucket_batches" -> lengthBucketBatches _,
    "epoch_shuffle"     -> epochShuffle _,
    "shard_rendezvous"  -> shardRendezvous _,
    "mixture_weights"   -> mixtureWeights _,
    "audio_pitch_autocorr" -> audioPitchAutocorr _,
    "doc_chunks"        -> docChunks _,
    "seq_pack"          -> seqPack _,
    "corpus_filter"     -> corpusFilter _,
    "gopher_repetition" -> gopherRepetition _,
    "bpe_train"         -> bpeTrain _,
    "bpe_encode"        -> bpeEncode _,
    "prepare_corpus"    -> prepareCorpus _,
    "mixture_sample"    -> mixtureSample _,
    "exact_substring"   -> exactSubstring _,
    "semdedup"          -> semdedup _,
    "decontaminate"     -> decontaminate _,
    "pii_scrub"         -> piiScrub _
  )
  /** Every query's DuckDB oracle — composed from the
    * per-domain part slices (round-13 split). */
  def oracleSql: Map[String, String] =
    textOracleSql ++
      embedOracleSql ++
      mediaOracleSql ++
      webOracleSql ++
      lakehouseOracleSql ++
      columnarOracleSql ++
      tensorOracleSql ++
      docOracleSql
}
