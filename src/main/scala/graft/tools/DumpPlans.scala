package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Regenerates PLANS.md: formatted physical plans for representative
  * queries, so shuffle/broadcast/pushdown decisions are reviewable without
  * running anything. Run: sbt "runMain graft.tools.DumpPlans"
  */
object DumpPlans {
  private val Representative = Seq(
    "q01_pricing_summary"     -> "partial+final hash agg, one shuffle",
    "q10_join_inner"          -> "broadcast dimension join",
    "q11_join_multiway"       -> "multiway star join",
    "q18_join_asof"           -> "as-of via union + running-last window",
    "q1b_join_asof_native"    -> "as-of via native custom operator",
    "q1e_join_asof_broadcast" -> "as-of via broadcast binary-search (no big-side shuffle)",
    "q19_join_salted"         -> "salted skew join",
    "q24_topk_per_group"      -> "WindowGroupLimit top-k",
    "q61_ngram_jaccard_dedup" -> "inverted-index Jaccard",
    "q62_minhash_lsh_dedup"   -> "MinHash banded LSH + exact verify",
    "q65_knn_bruteforce"      -> "broadcast brute-force kNN",
    "q66_ann_ivf"             -> "IVF ANN probe + rerank",
    "q5c_ann_ivf_hier"        -> "two-level IVF assignment (O(N·√k) compute)",
    "q56_vector_centroids"    -> "typed Aggregator UDAF",
    "q6c_embedding_dedup_bucketed" -> "IVF-cell-blocked near-dup (no corpus nested loop)",
    "q6d_canonical_corpus"    -> "dedup pipeline: cluster + narrow anti-join",
    "q5a_chunking"            -> "row-local chunking (no shuffle before final sort)",
    "q77_doc_sink_roundtrip"  -> "DSv2 graft-doc write + pruned scan + snapshot",
    "q79_doc_deletes"         -> "tombstone delete + point-in-time snapshot",
    "q6e_corpus_build"        -> "full corpus pipeline: gate + dedup + drop + chunk + sink",
    "q6f_media_features"      -> "mapPartitions resize/feature seam",
    "q6g_bloom_incremental_dedup" -> "bloom-prefiltered incremental dedup (in-plan sketch subquery)",
    "q5e_decontamination"     -> "benchmark n-gram decontamination (broadcast gram set)",
    "q5f_sequence_packing"    -> "per-shard running-sum packing (no global sort)",
    "q5i_ann_index_persist"   -> "ANN serve path from persisted index (equi joins + broadcast centroids)",
    "q5k_kmeans_build"        -> "3-round Lloyd build (driver loop, localCheckpoint-cut lineage)",
    "q5m_ann_index_update"    -> "incremental index update (delta-only assignment vs persisted centroids)",
    "q6i_semantic_dedup"      -> "SemDeDup: cell-rep anchor comparisons (broadcast rep join)",
    "q5p_containment_dedup"   -> "containment dedup (shared inverted-index candidates)",
    "q5o_dedup_split"         -> "dedup-aware split (clusters + narrow hash decision)",
    "q6h_image_decode"        -> "real PNG decode via mapPartitions seam (row-local)",
    "q0d_cms_token_freq"      -> "CMS sketch + scalar-subquery total + TakeOrderedAndProject top-20",
    "q6k_cc_incremental"      -> "incremental CC: reduced-graph merge + broadcast relabel",
    "q6l_line_dedup"          -> "line dedup: hash-only decision shuffle + broadcast drop-list reassembly",
    "q5r_bm25"                -> "BM25: row-local tf, broadcast stats, WindowGroupLimit top-10",
    "q5s_pq_adc"              -> "PQ/ADC: broadcast codebook + lookup tables, map-side argmin + partial sums",
    "q5t_ivfpq"               -> "IVF-PQ serve: cell probe + lookup-table scoring of probed candidates only",
    "q5u_hybrid_rrf"          -> "hybrid RRF: inverted-index lexical rank + cosine rank, rank-only fusion",
    "q1f_join_range"          -> "range join: interval-to-bin explode + hash join on bin, residual range filter",
    "q0e_hll_sketch_union"    -> "HLL sketches as data: per-partition build, rollup by sketch union",
    "q5v_temperature_mix"     -> "temperature upsampling: broadcast factors, row-local epoch explode",
    "q5w_lm_bigram_score"     -> "bigram LM score: gram-count shuffles only, decimal-sum determinism",
    "q0f_theta_funnel"        -> "theta funnel: per-audience sketch build, set algebra on fixed-size sketches",
    "q1g_zorder_layout"       -> "z-order: one reused stats subquery, codegen'd interleave projection",
    "q1h_stable_ids"          -> "stable ids: range partition + offsets join, zero global windows",
    "q5x_global_packing"      -> "global packing: runningTotal prefix sum, zero global windows",
    "q1i_join_interval_overlap" -> "interval overlap: bin equi join + first-common-bin residual",
    "q6n_pagerank"            -> "pagerank: per-round contrib shuffle, scalar dangling mass, top-k",
    "q6o_image_resize"        -> "real NN resize: row-local decode-resize-reencode seam",
    "q6p_label_propagation"   -> "label propagation: per-round narrow shuffle + integer argmax",
    "q8i_stream_hll_sketch"   -> "streaming HLL fold: per-batch sketch + fixed-size state union",
    "q6q_triangle_count"      -> "triangles: degree-oriented wedge join (O(m^1.5) bound, no hub blowup)",
    "q6r_prefix_jaccard_join" -> "lossless prefix-filtered Jaccard: rarest-first prefix index + exact verify",
    "q5y_cdc_chunking"        -> "content-defined chunking: row-local boundary HOFs, hash-only dup shuffle",
    "q5z_weighted_sample"     -> "weighted reservoir sample: per-source window, WindowGroupLimit",
    "q1j_bucketed_join"       -> "bucketed co-located join: SMJ with zero exchanges under the join",
    "q6t_ivfpq_rerank"        -> "IVF-PQ + exact rerank: 8-byte ADC prerank, raw vectors only for top-10",
    "q42_retention_cohort"    -> "retention cohorts: two user_id shuffles + narrow final agg",
    "q8j_stream_chunk_dedup"  -> "streaming chunk dedup: row-local chunking, stateless stream-static probe",
    "q6s_kcore"               -> "k-core peeling: per-round degree agg + two semi joins",
    "q6u_trustrank"           -> "TrustRank: seed-restricted teleport, per-round contrib shuffle",
    "q43_funnel_sequence"     -> "windowed funnel: three per-user min aggs, no event-to-event join",
    "q1k_partition_pruning"   -> "hive-style partition pruning: day predicate resolved at planning time",
    "q44_markov_transitions"  -> "markov transitions: per-user lag window + narrow |types|^2 agg",
    "q6z_exact_substring_spans" -> "exact substr spans: compiled rolling-hash pass, 8-byte hash shuffle, string verify on candidates only",
    "q90_bpe_train"           -> "BPE train: vocab agg once, per-round narrow pair shuffles, broadcast winners",
    "q91_bpe_encode"          -> "BPE encode: broadcast 1-row merge frame, row-local replace chain",
    "q93_blocklist_scan"      -> "Aho-Corasick blocklist: one automaton pass, in-plan broadcast pattern set",
    "q96_phrase_search"       -> "phrase search: postings self-join on (doc, pos+1), broadcast phrase terms",
    "q97_landmark_bfs"        -> "landmark BFS: per-level frontier join + anti-join vs settled, union of cut levels",
    "q99_hits"                -> "HITS: per-half-step narrow score shuffle, scalar-subquery L1 normalization",
    "q9a_term_lift"           -> "term lift: broadcast top-40 vocab prunes postings before per-doc pair self-join",
    "q9b_token_mask"          -> "MLM masking: one row-local transform HOF, zero shuffle beyond the scan",
    "q9d_source_divergence"   -> "source KL: narrow (source, word) aggs, broadcast word marginals, decimal sums",
    "q9e_adamic_adar"         -> "Adamic-Adar: edge self-join on dst + indeg weights, TakeOrderedAndProject top-100",
    "q9f_token_entropy"       -> "token entropy: explode on scan partitions, narrow (doc, tok, count) shuffle, decimal sums",
    "q9g_column_profile"      -> "column profile: one scan through multi-distinct Expand, row-local unpivot",
    "q9i_event_anomaly"       -> "robust anomaly: per-type median/MAD frames broadcast onto the scan, row-local flags",
    "q9j_cluster_quality"     -> "Davies-Bouldin: broadcast-argmax assignment, k^2 centroid-pair frame off-corpus",
    "q9k_record_linkage"      -> "record linkage: sorted-neighborhood rank equi join (N*W candidates), jaro_winkler verify",
    "q9n_length_bins"         -> "equi-depth binning: broadcast decile boundary frame, row-local bucketing, no ntile window",
    "q9p_vocab_growth"        -> "Heaps curve: per-term first-doc agg, triangle join on the 10-row bucket frame",
    "q9q_weighted_sssp"       -> "Bellman-Ford: per-round narrow (l, node, d) min-agg shuffle, early fixpoint exit",
    "q9r_rank_eval"           -> "MRR/nDCG: broadcast query frame, per-query top-10 window, tiny metric arithmetic",
    "q9t_image_phash_dedup"   -> "image dHash: codec seam rows, 4 band equi-joins, xor/popcount verify",
    "qa0_mjpeg_video_decode"  -> "MJPEG-in-AVI: row-local compressed-frame decode seam, no shuffle before final sort",
    "qa1_dsir_selection"      -> "DSIR selection: 512-bucket count frames, broadcast log-ratio table",
    "qa2_unimax_mix"          -> "UniMax waterfilling: triangular joins on the sources frame, no window",
    "qa3_novel_ngrams"        -> "novelty profile: two-pass gram DF pipeline, grams+counts shuffles only",
    "qa4_linkage_multipass"   -> "two-pass SNM: rank equi joins under key and reversed key, union, verify once",
    "qa5_incremental_minhash" -> "incremental near-dup serve: persisted index scans, broadcast drop list, LSH equi join",
    "qa6_k_anonymity"         -> "k-anonymity audit: one QI groupBy, generalized level over the class frame",
    "qa7_token_fertility"     -> "tokenizer fertility: broadcast merges through one encode pass, one slice groupBy",
    "qa8_minhash_index_merge" -> "index-generation merge: narrow DF full-outer, row-local set fix, changed-rows-only re-sign",
    "qa9_l_diversity"         -> "l-diversity audit: one (QI, sensitive) corpus pass, class stats over the aggregated frame",
    "qaa_minhash_serve_deletes" -> "tombstoned index serve: broadcast narrow-id anti join at the candidate stage, frozen drop list",
    "qab_t_closeness"         -> "t-closeness audit: one (QI, bin) corpus pass, broadcast grid frames, class-partitioned cumsum",
    "qac_sq_int8"             -> "SQ8 quantization: one bounds row broadcast through encode, query-block BNLJ serve, per-query rank windows",
    "qad_join_size_estimate"  -> "join-size estimator: day-level aggregates per side, broadcast day-frame join, no row-to-row corpus join",
    "qae_range_partition_plan" -> "range-partition plan: bounded-sample percentile splitters broadcast, row-local fold assignment, audit groupBy",
    "qaf_histogram_selectivity" -> "histogram selectivity: one bucket pass carrying splitter bounds, OR-join conditional sums, one exact pass",
    "qag_watermark_profile"   -> "watermark profile: two-phase global running max (range partition + pid-local window), per-type percentile fold",
    "qah_compaction_plan"     -> "compaction plan: per-file counts from the directory, day-partitioned cumsum bin assignment",
    "qai_stream_quantile"     -> "streaming windowed GK quantiles, post-drain rank-band verify join against the corpus",
    "qaj_incremental_stats"   -> "incremental stats: serve reads the persisted catalog generation, broadcast day join, no orders scan",
    "qak_histogram_maintenance" -> "histogram maintenance: serve reads the merged generation, one exact-eval corpus pass only",
    "q9v_centroid_drift"      -> "centroid drift: long-format decimal means, 64-row global frame broadcast",
    "q9w_pareto_users"        -> "Pareto 80/20: per-type window, exact decimal running share",
    "q9y_canonical_authority" -> "canonical by authority: PageRank rounds + map-side family argmax",
    "qar_wordpiece_train"     -> "WordPiece round: vocab-sized pair+unit aggs, broadcast unit joins, decimal fixed-point argmax",
    "qas_wordpiece_encode"    -> "MaxMatch encode: row-local cursor HOF per vocab word, broadcast (word, counts) onto the doc scan",
    "qat_beam_graph_serve"    -> "beam serve: per-hop stored-edge equi join + dedup agg + per-query top-B window over the persisted graph",
    "qau_suffix_ranks"        -> "prefix doubling: per-round (doc_id,pos+gap) self-join + StableIds dense rank over distinct keys",
    "qav_quality_classifier"  -> "GD round: one narrow 4-sum gradient agg (map-side combine), 1-row weight frame broadcast back",
    "qaw_dbscan_clusters"     -> "DBSCAN: cell-blocked eps pairs, degree agg, CC rounds on core edges, min-label border join",
    "qay_mis_keep_policy"     -> "Luby round: undecided-subgraph semi joins, per-node min-priority agg, winner/loser retirement",
    "qaz_skyline"             -> "skyline: per-spend group max, StableIds numbering + running max, sid-1 shift equi join",
    "qb0_linkage_matching"    -> "local-max round: per-vertex struct-argmax agg, both-endpoint lock join, anti-join retirement",
    "qal_unigram_lm"          -> "unigram-LM EM: integer Viterbi DP unrolled as narrow per-position joins, vocab-sized count aggs",
    "qap_unigram_encode"      -> "unigram encode: vocab folded to one broadcast frame, row-local Viterbi over the doc scan",
    "qam_join_order"          -> "CBO pick: 2-row catalog read prices both left-deep orders, picked star executes broadcast-first",
    "qaq_graph_ann_serve"     -> "greedy serve: per-hop stored-edge equi join + 10-row argmax window over the persisted graph",
    "qax_hierarchical_graph_serve" -> "two-layer serve: sparse upper-layer walk hands per-query entry to the layer-0 walk, stored edges only",
    "qb1_kn_perplexity"       -> "Kneser-Ney: gram-count shuffles for the model, one broadcast model row onto the scoring pass",
    "qb2_linkage_dendrogram"  -> "dendrogram levels: DF-capped pair set built once + lineage-cut, per-level filter + CC + narrow aggs",
    "qb3_graph_insert"        -> "graph insert: id-algebra probe + beam seed scored per delta node, touched-only base re-top-K, one local refine round",
    "qb4_graph_delete"        -> "graph delete: tombstone drop + FreshDiskANN local repair (former-list candidates, semi/anti touched split)",
    "qb5_graph_compaction"    -> "graph compaction: generation chain folded, live set from the chain, qao rebuild over exactly the live corpus",
    "qb6_ivf_compaction"      -> "IVF compaction: membership generations minus tombstones, re-seeded build + q66 probe over the live corpus",
    "qb7_minhash_compaction"  -> "MinHash compaction: corpus-free DF debit from tombstoned index rows, drop-list re-cut, row-local re-admission, touched-only re-sign",
    "qb8_suffix_compaction"   -> "suffix compaction: row-local position drop, per-key count debit, O(dict) StableIds renumber of the surviving dictionary",
    "q8z_stream_pq_serve"     -> "streaming PQ serve: per-micro-batch 128-row LUT from the persisted codebook, (j,code) equi join over stored codes",
    "q8y_stream_graph_serve"  -> "streaming graph-ANN serve: per-micro-batch beam walk over the persisted graph (stateless, batch-keyed outputs)")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append("Auto-generated by `graft.tools.DumpPlans` (sf0.001, AQE final plans).\n")
    sb.append("Regenerate after plan-shape changes; PlanSpec gates the invariants.\n")
    for ((name, note) <- Representative) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE
      sb.append(s"\n## $name — $note\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
