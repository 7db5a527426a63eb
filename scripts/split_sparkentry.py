#!/usr/bin/env python3
"""One-shot pure-move refactor (VERDICT r9 next-5): split SparkEntry.scala's
6k-line registry into per-domain objects merged back into SparkEntry.queries /
.oracleSql. Each query's Spark body and its DuckDB oracle twin move TOGETHER
into the same domain file; shared oracle CTE fragments move into a trait the
domain objects extend, so no reference inside any entry changes."""
import re, sys, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")  # 0-based; scala line N = lines[N-1]

def seg(entries_start, close_line):
    """Split map-literal body into named segments; the comment block directly
    above an entry (it documents that entry) moves WITH it."""
    body = lines[entries_start:close_line - 1]  # after Map( .. before `  )`
    starts = [i for i, l in enumerate(body) if re.match(r'^    "q', l)]
    assert starts, "no entries found"
    def comment_start(s):
        b = s
        while b > 0 and re.match(r'^\s*(//.*)?$', body[b - 1]):
            b -= 1
        return b
    bounds = [comment_start(s) for s in starts]
    bounds[0] = 0
    out = []
    for k, s in enumerate(starts):
        e = bounds[k + 1] if k + 1 < len(starts) else len(body)
        name = re.match(r'^    "(q[0-9A-Za-z_]+)"', body[s]).group(1)
        out.append((name, body[bounds[k]:e]))
    return out

QO, QC = 43, 2353        # queries Map( line, close line
OO, OC = 2831, 6041      # oracleSql Map( line, close line
qsegs = seg(QO, QC)
osegs = seg(OO, OC)
assert len(qsegs) == 196 and len(osegs) == 196, (len(qsegs), len(osegs))
assert set(n for n, _ in qsegs) == set(n for n, _ in osegs)

DOMAINS = ["Relational", "Text", "Dedup", "Ann", "Graph", "Stats", "Stream"]
def domain(name):
    n = name
    def has(*ws): return any(w in n for w in ws)
    if has("stream", "upsert", "scd2", "diff", "expect", "skew", "zone",
           "zorder", "compact", "session", "watermark"):
        return "Stream"
    if has("pagerank", "ppr", "triangle", "lpa", "label_prop", "kcore",
           "k_core", "hits", "components", "component", "graph"):
        return "Graph"
    if has("welch", "chi2", "ks_", "_ks", "spearman", "kappa", "psi",
           "benford", "woe", "auc", "average_precision", "_ap", "bootstrap",
           "change_point", "cusum", "survival", "km_", "kaplan", "gini",
           "concentration", "outlier", "ttest", "rbo", "heaps", "good_turing",
           "stats", "median", "quantile", "sketch", "hll", "kll", "theta",
           "freq", "countmin", "corr", "vocab_growth"):
        return "Stats"
    if has("ann", "ivf", "pq_", "_pq", "knn", "cosine", "embed", "mmr",
           "bm25", "hybrid", "rerank", "centroid", "search", "recall",
           "retrieval", "rrf"):
        return "Ann"
    if has("dedup", "minhash", "simhash", "jaccard", "lsh", "neardup",
           "shingle", "containment", "winnow", "substring", "fuzzy",
           "jaro", "blocking", "entity", "linkage", "fingerprint",
           "decontam", "exact_dup"):
        return "Dedup"
    if has("lang", "quality", "token", "bpe", "unigram", "pii", "repetition",
           "markup", "text", "doc", "surprisal", "dsir", "kl", "sample",
           "pack", "budget", "temperature", "apportion", "stratif",
           "negative", "top_mass", "classify", "nb_", "tfidf", "ngram",
           "fertility", "curat"):
        return "Text"
    return "Relational"

byd = collections.defaultdict(lambda: {"q": [], "o": []})
omap = dict(osegs)
for name, body in qsegs:
    d = domain(name)
    byd[d]["q"].append((name, body))
    byd[d]["o"].append((name, omap[name]))

IMPORTS = """import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.{Audit, Bpe, Classify, Dedup, Dsir, Graph, Grouping, Intervals, Joins, Layout, Lm, Ops, Pack, Profile, Search, Sequences, Similarity, Sketches, Stats}
import graft.functions.{Jsons, Multimodal, Pii, Quality, Repetition, Text}
import graft.streaming.Streams"""

DOCS = {
    "Relational": "relational core: the reference's own workload, filters, dedup, grouping, joins, sorts, set ops, windows, sources, JSON, cleaning",
    "Text": "text analysis & curation: language/quality/tokens, BPE, sampling, budgets, packing, DSIR, classification",
    "Dedup": "deduplication & record linkage: exact/MinHash/SimHash/Jaccard, containment, winnowing, fuzzy joins, entity resolution",
    "Ann": "similarity search: brute/LSH/IVF/PQ ANN, BM25, hybrid retrieval, MMR",
    "Graph": "graph: PageRank, personalized PR, label propagation, triangles, k-core, HITS, connected components",
    "Stats": "statistics & sketches: hypothesis tests, rank metrics, survival, drift, HLL/KLL/Theta/count-min",
    "Stream": "streaming twins & table maintenance: foreachBatch gates, upsert/SCD2/diff, expectations, layout",
}

for d in DOMAINS:
    if not byd[d]["q"]:
        continue
    qbody = "\n".join("\n".join(b) for _, b in byd[d]["q"])
    obody = "\n".join("\n".join(b) for _, b in byd[d]["o"])
    # q53 references a SparkEntry helper by bare name
    qbody = qbody.replace(" neardupRecallAt(", " SparkEntry.neardupRecallAt(")
    names = ", ".join(n for n, _ in byd[d]["q"][:6])
    content = f"""package graft

{IMPORTS}

/** [[SparkEntry]] registry slice — {DOCS[d]}.
  * Pure move from SparkEntry.scala (r10 registry split): every entry kept
  * verbatim next to its DuckDB oracle twin. First ids: {names}, … */
private[graft] object Queries{d} extends OracleSqlHelpers {{
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{qbody}
  )

  val oracleSql: Map[String, String] = Map(
{obody}
  )
}}
"""
    open(f"src/main/scala/graft/Queries{d}.scala", "w").write(content)
    print(f"Queries{d}: {len(byd[d]['q'])} queries, "
          f"{content.count(chr(10))} lines")

# ---- trait with the shared oracle CTE fragments -------------------------
helper1 = "\n".join(lines[2418:2830])     # lines 2419..2830 (sql fragments)
helper2 = "\n".join(lines[6042:6161])     # lines 6043..6161 (post-map defs)
helper1 = re.sub(r'^  private (val|def) ', r'  protected \1 ', helper1, flags=re.M)
helper2 = re.sub(r'^  private (val|def) ', r'  protected \1 ', helper2, flags=re.M)
trait = f"""package graft

/** Shared DuckDB oracle CTE fragments and unrolled-round SQL builders,
  * extended by every Queries* registry slice so entry bodies reference them
  * by bare name exactly as they did inside SparkEntry (pure move). */
private[graft] trait OracleSqlHelpers {{
{helper1}
{helper2}
}}
"""
open("src/main/scala/graft/OracleSqlHelpers.scala", "w").write(trait)
print(f"OracleSqlHelpers: {trait.count(chr(10))} lines")

# ---- new SparkEntry ------------------------------------------------------
pre = "\n".join(lines[0:42])              # through `def entry` + blank
recall = "\n".join(lines[2354:2418])      # recall helpers (before sql frags)
merge_q = " ++\n    ".join(f"Queries{d}.queries" for d in DOMAINS if byd[d]["q"])
merge_o = " ++\n    ".join(f"Queries{d}.oracleSql" for d in DOMAINS if byd[d]["q"])
entry_new = f"""{pre}
  /** Registry: merged from the per-domain Queries* slices (r10 split —
    * SparkEntry.scala had grown to 6.2k lines; navigation beat monolith).
    * Key sets are disjoint by construction (asserted in ApiSpec). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    {merge_q}

  def oracleSql: Map[String, String] =
    {merge_o}

{recall}
}}
"""
open(SRC, "w").write(entry_new)
print(f"SparkEntry: {entry_new.count(chr(10))} lines")
