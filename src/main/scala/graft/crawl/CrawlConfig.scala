package graft.crawl

/** Tunables of the crawl (BASELINE.json:6,14). All semantics that depend
  * on these are PINNED identically in the engine and the sequential
  * oracle (SURVEY.md §0). */
final case class CrawlConfig(
  /** Links discovered deeper than this are never enqueued (P2). */
  maxDepth: Int = 10,
  /** Per-host fetch cap per round; overflow carries to the next round (W2). */
  perHostPerRound: Int = 50,
  /** Total fetch budget across the crawl; truncation follows the global
    * crawl order (O2) [PINNED: discovered links of the final truncated
    * round still enter the seen set, like the reference's
    * seen-at-enqueue semantics]. */
  totalBudget: Long = Long.MaxValue,
  /** Crawl delay for hosts without a robots crawl_delay_ms. */
  defaultDelayMs: Long = 0L,
  /** Seen-set shard count P: bloom shards + pmod(url_hash, P) layout. */
  partitions: Int = 32,
  /** Expected insertions per bloom shard (sized for the tier). */
  bloomShardCapacity: Long = 200000L,
  bloomFpp: Double = 0.01,
  /** Bloom prefilter before the exact anti-join (J1 two-phase). */
  useBloom: Boolean = true,
  /** Approximate-membership filter kind for the seen shards:
    * "bloom" (default) or "cuckoo" (deletion support, better space at
    * low FPP) — the north-star's "bloom/cuckoo" pair. */
  seenFilter: String = "bloom",
  /** Use the skew-safe two-phase scheduler (explicit salting path). */
  saltedScheduler: Boolean = true,
  /** Robots filter as a Dataset join (RobotsJoin) instead of the
    * broadcast codegen expression — the web-scale path when the rule
    * table outgrows task serialization (10^7+ hosts). Identical crawl
    * (tested); costs one extra frontier shuffle per round. */
  robotsViaJoin: Boolean = false,
  /** Use the typed per-host heap (Q1) instead of the window scheduler
    * (W1); results must be identical — tests assert it. */
  typedHeapScheduler: Boolean = false,
  /** Compact the seen-set delta chain into one base file once this many
    * live files accumulate (Iceberg-style compaction: keeps the per-round
    * scan O(1) instead of O(rounds), amortized O(log) rewrite). */
  seenCompactEvery: Int = 8,
  /** Files per snapshot write (fetchlog/delta/frontier). Task-commit
    * overhead dominates small-round writes at 32 files; at 10^10-URL
    * scale set this to `partitions` so write parallelism matches. */
  snapshotWriteFiles: Int = 8,
  /** Skinny scheduling: url_canon (the frontier's widest column) does
    * not transit the scheduler/global-order/fetch exchanges — the
    * allowed frontier is cached once, a (url_hash, url_canon) projection
    * is hash-partitioned once, and both the fetch join and the carried
    * path recover the string by url_hash off that aligned cache
    * (exchange-free on the canon side). Cuts per-round shuffle bytes
    * ~40% — worth it ONLY where shuffle is network-bound and rounds are
    * large enough to amortize the two extra cache materializations.
    * Measured on this single-JVM box (same-binary interleaved A/B,
    * BENCH/BASELINE.md §5): ~14% faster at c8 but ~17% SLOWER at c32 in
    * every pair — the extra per-round barriers dominate when the sandbox
    * corpus leaves cores starved — so the default is the wide shape;
    * wide≡skinny crawl equality is pinned in CrawlEngineSpec.
    * Ignored (wide) under typedHeapScheduler, which needs the string
    * in its typed rows. */
  skinnySchedule: Boolean = false,
  /** Auto-expire superseded snapshot data files every this many rounds
    * (0 = never — expiry stays a manual [[SnapshotStore.expireRounds]]
    * call). Without expiry a 1000-round crawl keeps every superseded
    * frontier/delta/host-ready/bloom version forever: storage
    * O(rounds × state) instead of O(live state + fetch logs). Runs on
    * the pipelined round tail right after the commit, so it costs the
    * critical path nothing. */
  expireEveryRounds: Int = 0,
  /** Rounds kept fully resumable by auto-expiry. MUST be ≥ 2 inside a
    * running crawl: the in-flight round's persisted frames (schedAll,
    * fetched) derive from the PREVIOUS round's frontier file, and a
    * cache-eviction recompute after an executor loss would re-scan it —
    * keepLast=1 would have deleted it. (Offline expireRounds calls on a
    * quiesced snapshot may use keepLast=1.) */
  expireKeepLast: Int = 2,
  /** Per-URL priority scheduling — the "priority" half of the north
    * star's min-heap key "(host, next-fetch-time, depth/priority)",
    * realized with an actual priority signal distinct from discovery
    * depth. [PINNED semantics, mirrored in CrawlOracle.prioOf]:
    * priority = the canonical URL's length in Unicode code points —
    * shorter URLs fetch first, the classic cheap importance proxy
    * (short URLs correlate with hubs/section roots; leaf/detail pages
    * carry long paths and query strings) — and the per-host schedule
    * orders by (priority asc, depth asc, url_hash asc) instead of
    * (depth, url_hash). Priority is a pure function of url_canon,
    * recomputed at schedule time — carried rows and the frontier
    * files keep their schema, and every downstream key (global crawl
    * order, intra-round dedup, seen set) is untouched. Off by default:
    * the pinned default crawl stays byte-identical. */
  priorityByUrlLen: Boolean = false,
  /** Follow media spans: enqueue each media span's `media_ref` as a
    * frontier candidate alongside the text spans' extracted links — the
    * asset-fetching half of a crawler over INTERLEAVED text+media
    * documents (BASELINE.json "interleaved" payload; a PyCrawler-class
    * crawler downloads the images/videos its pages reference, not just
    * the pages). [PINNED semantics, mirrored in CrawlOracle]:
    *  - a media_ref is followed iff it starts with "media://" and has a
    *    non-empty host (refs are emitted absolute + canonical by the
    *    corpus producer; the RFC 3986 http(s) canonicalizer deliberately
    *    does not apply to the opaque media scheme — the ref is used
    *    byte-verbatim, so span byte-equality and URL identity agree);
    *  - candidate order within a document is span order — a media span
    *    contributes its single ref at (span_idx, link_pos=0), text spans
    *    their extracted links in extraction order — so the intra-round
    *    first-discovery-wins dedup key is unchanged;
    *  - media URLs flow through the SAME robots filter (host rules,
    *    path longest-prefix match), per-host politeness clock (assets
    *    are served by the same host budget), depth cap, seen set and
    *    fetch log as page URLs; their fetch resolves to no document
    *    (status "media", doc_id "") and extracts nothing — media is a
    *    leaf. Off by default: the pinned text-only crawl stays
    *    byte-identical to rounds 1–3. */
  followMedia: Boolean = false)
