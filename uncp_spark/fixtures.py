"""Deterministic synthetic ``repos`` corpus with planted duplicate structure.

Mirrors the reference's fixture pattern (/root/reference/test_data/:
byte-identical copies readme.md = readme_copy.md, a 2-line near-dup
readme_near.md, +1-byte medium_similar.txt, unrelated configs/ and logs/)
scaled up programmatically, per FIXTURES.md §1.

Planted classes (each row labeled in ``dup_class`` for oracle checks):

  exact        identical content under a different (repo, path)
  near         1-3 mutated/inserted lines (token Jaccard ≳ 0.85)
  contained    file A = verbatim block of file B plus extra code
  boilerplate  one LICENSE-like blob shared by ~40% of repos (hot band / skew)
  same_name    config.json in many repos, different content
  same_size    padded to a shared byte length, different content
  unique       negatives

Everything derives from ``random.Random(seed)`` — two calls with the same
arguments produce byte-identical tables (determinism gate, SURVEY.md §5).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_WORDS = (
    "def class return import for while if else elif try except with as "
    "lambda yield assert pass break continue global del not and or in is "
    "self args kwargs value result data index count total buffer stream "
    "parse build merge split filter reduce cache flush token node edge "
    "graph table column row batch shard config handler worker queue"
).split()

REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("dup_class", T.StringType(), False),
        T.StructField("dup_group", T.LongType(), False),  # -1 = no planted group
    ]
)

_LANGS = ["python", "rust", "javascript", "markdown", "yaml", "text"]
_EXT = {
    "python": "py",
    "rust": "rs",
    "javascript": "js",
    "markdown": "md",
    "yaml": "yaml",
    "text": "txt",
}


def _commit_for(repo: str, seed: int) -> str:
    return hashlib.sha1(f"{repo}:{seed}".encode()).hexdigest()


def _gen_lines(rng: random.Random, n_lines: int) -> list[str]:
    return [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 12)))
        for _ in range(n_lines)
    ]


@dataclass
class FixtureSpec:
    n_repos: int = 20
    files_per_repo: int = 12
    seed: int = 42
    # fraction of repos carrying the boilerplate blob (skew target)
    boilerplate_frac: float = 0.4
    giant_repo_factor: int = 6  # repo 0 gets this many x files (skew)


def generate_repos_rows(spec: FixtureSpec) -> list[tuple]:
    """Pure-Python row generation (driver-side; fixture scale only).

    At real scale the corpus is an existing Iceberg/Parquet table — this
    generator exists solely to plant known duplicate structure for tests
    and benchmarks.
    """
    rng = random.Random(spec.seed)
    rows: list[tuple] = []
    group_id = 0

    boiler_lines = _gen_lines(rng, 30)
    boiler = "\n".join(boiler_lines)

    for i in range(spec.n_repos):
        repo = f"org{i % 5}/proj{i}"
        commit = _commit_for(repo, spec.seed)
        n_files = spec.files_per_repo * (spec.giant_repo_factor if i == 0 else 1)

        # boilerplate LICENSE in a subset of repos (exact-dup hot content)
        if rng.random() < spec.boilerplate_frac:
            rows.append((repo, "LICENSE", commit, "text", boiler, "boilerplate", 0))

        # same-name different-content config.json everywhere
        cfg = "\n".join(_gen_lines(rng, 5))
        rows.append((repo, "config.json", commit, "yaml", cfg, "same_name", -1))

        for j in range(n_files):
            lang = rng.choice(_LANGS)
            ext = _EXT[lang]
            depth = rng.randint(1, 6)
            dirs = "/".join(f"d{rng.randint(0, 9)}" for _ in range(depth - 1))
            path = (dirs + "/" if dirs else "") + f"file_{j}.{ext}"
            lines = _gen_lines(rng, rng.randint(8, 60))
            content = "\n".join(lines)
            kind = rng.random()

            if kind < 0.12 and i + 1 < spec.n_repos:
                # exact duplicate: copy into the next repo under another path
                group_id += 1
                rows.append((repo, path, commit, lang, content, "exact", group_id))
                other = f"org{(i + 1) % 5}/proj{i + 1}"
                rows.append(
                    (other, f"vendored/{path}", _commit_for(other, spec.seed),
                     lang, content, "exact", group_id)
                )
            elif kind < 0.24 and len(lines) >= 12:
                # near duplicate: mutate 1-3 lines
                group_id += 1
                rows.append((repo, path, commit, lang, content, "near", group_id))
                mutated = list(lines)
                for _ in range(rng.randint(1, 3)):
                    pos = rng.randrange(len(mutated))
                    mutated[pos] = " ".join(rng.choice(_WORDS) for _ in range(6))
                rows.append(
                    (repo, f"forks/{path}", commit, lang, "\n".join(mutated),
                     "near", group_id)
                )
            elif kind < 0.30 and len(lines) >= 20:
                # containment: B = A + extra block
                group_id += 1
                rows.append((repo, path, commit, lang, content, "contained", group_id))
                extra = _gen_lines(rng, rng.randint(4, 10))
                rows.append(
                    (repo, f"bundled/{path}", commit, lang,
                     content + "\n" + "\n".join(extra), "contained", group_id)
                )
            elif kind < 0.36:
                # same size, different content (pad to 512 bytes)
                filler = " ".join(rng.choice(_WORDS) for _ in range(200))[:512]
                rows.append((repo, path, commit, lang, filler, "same_size", -1))
            else:
                rows.append((repo, path, commit, lang, content, "unique", -1))
    return rows


def generate_low_j_containment_rows(
    n_pairs: int = 12,
    seed: int = 7,
    big_lines: int = 350,
    small_lines: int = 12,
    n_noise: int = 10,
) -> list[tuple]:
    """Planted LOW-JACCARD containment pairs: file A is a contiguous
    line block of file B at size ratio ~big_lines/small_lines (~30:1 by
    default), so token Jaccard ≈ 0.03 — far below MinHash-LSH band
    reach — while shingle containment is exactly 1.0 (a contiguous
    token subsequence contributes a subset of B's 5-token windows).
    This is the north_rule's "file A = a block of file B plus extra
    code" case that the planted ``contained`` class (small appended
    tail ⇒ HIGH Jaccard) does not cover. Kept out of
    ``generate_repos_rows`` so existing fixture corpora stay
    byte-identical (same rng consumption)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    for g in range(n_pairs):
        big = _gen_lines(rng, big_lines)
        lo = rng.randint(0, big_lines - small_lines)
        small = big[lo:lo + small_lines]
        repo = f"orgc/proj{g}"
        commit = _commit_for(repo, seed)
        rows.append((repo, f"src/big_{g}.py", commit, "python",
                     "\n".join(big), "contained_low_j", 10_000 + g))
        rows.append((repo, f"blocks/small_{g}.py", commit, "python",
                     "\n".join(small), "contained_low_j", 10_000 + g))
    for u in range(n_noise):
        repo = f"orgu/proj{u}"
        rows.append((repo, f"misc/u_{u}.txt", _commit_for(repo, seed),
                     "text", "\n".join(_gen_lines(rng, rng.randint(20, 80))),
                     "unique", -1))
    return rows


def make_repos(spark: SparkSession, spec: FixtureSpec | None = None) -> DataFrame:
    """The planted-duplicate fixture table, as a DataFrame."""
    spec = spec or FixtureSpec()
    rows = generate_repos_rows(spec)
    n_part = max(4, min(32, len(rows) // 256))
    return spark.createDataFrame(rows, REPOS_SCHEMA).repartition(n_part)


def repos_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a ``repos``-shaped table from the driver's ``documents``
    parquet, planting exact + near duplicates with *SQL-expressible*
    transforms so a DuckDB oracle can reproduce it exactly
    (__spark_entry__ contract). Near-dup = original + a short appended
    token tail (high-Jaccard containment-style mutation); the ``bundle/``
    branch plants LOW-JACCARD containment: every 4th window of 12 long
    (≥300-char) documents is concatenated into one bundle file, so each
    member doc is verbatim-contained (shingle containment 1.0) at size
    ratio ~15 — token Jaccard ≈ 0.065, far below LSH band reach — and
    the end-to-end near-dup oracle therefore witnesses the bottom-k
    containment-sketch candidate tier (operators/containment_index.py).
    At sketch size 256 the expected shared-id count per member is
    ~n_doc·256/n_bundle ≈ 17, and the derivation is seedless/hash-
    deterministic, so recovery is exact run-over-run. Windows with only
    ONE qualifying document are dropped (HAVING count >= 2): a 1-member
    bundle is byte-identical to its member, collapsing to one exact-dup
    representative and putting an unpayable self-pair in any
    containment ground truth built from the bundle spec."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("_docs_src")
    return spark.sql(
        """
        SELECT concat('src/', source) AS repo,
               concat('docs/doc_', cast(doc_id AS string), '.txt') AS path,
               'deadbeef' AS commit, lang, text AS content
        FROM _docs_src
        UNION ALL
        SELECT concat('mirror/', source) AS repo,
               concat('vendored/docs/doc_', cast(doc_id AS string), '.txt') AS path,
               'deadbeef' AS commit, lang, text AS content
        FROM _docs_src WHERE doc_id % 3 = 0
        UNION ALL
        SELECT concat('fork/', source) AS repo,
               concat('forks/doc_', cast(doc_id AS string), '.txt') AS path,
               'deadbeef' AS commit, lang,
               concat(coalesce(text, ''),
                      ' trailing patch line alpha beta gamma') AS content
        FROM _docs_src WHERE doc_id % 5 = 0
        UNION ALL
        SELECT 'bundle/corpus' AS repo,
               concat('bundles/bundle_',
                      cast(cast(floor(doc_id / 12) AS bigint) AS string),
                      '.txt') AS path,
               'deadbeef' AS commit, min(lang) AS lang,
               concat_ws(' ', transform(
                   array_sort(collect_list(struct(doc_id, text))),
                   x -> x.text)) AS content
        FROM _docs_src
        WHERE text IS NOT NULL AND length(text) >= 300
          AND cast(floor(doc_id / 12) AS bigint) % 4 = 0
        GROUP BY cast(floor(doc_id / 12) AS bigint)
        HAVING count(*) >= 2
        """
    )


# DuckDB-equivalent SQL for repos_from_documents, used by oracle_sql()
# entries. Must stay semantically identical to the Spark SQL above.
REPOS_FROM_DOCUMENTS_DUCKDB = """
    SELECT concat('src/', source) AS repo,
           concat('docs/doc_', cast(doc_id AS varchar), '.txt') AS path,
           'deadbeef' AS "commit", lang, text AS content
    FROM documents
    UNION ALL
    SELECT concat('mirror/', source) AS repo,
           concat('vendored/docs/doc_', cast(doc_id AS varchar), '.txt') AS path,
           'deadbeef' AS "commit", lang, text AS content
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT concat('fork/', source) AS repo,
           concat('forks/doc_', cast(doc_id AS varchar), '.txt') AS path,
           'deadbeef' AS "commit", lang,
           concat(coalesce(text, ''),
                  ' trailing patch line alpha beta gamma') AS content
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT 'bundle/corpus' AS repo,
           concat('bundles/bundle_',
                  cast(cast(floor(doc_id / 12) AS bigint) AS varchar),
                  '.txt') AS path,
           'deadbeef' AS "commit", min(lang) AS lang,
           string_agg(text, ' ' ORDER BY doc_id) AS content
    FROM documents
    WHERE text IS NOT NULL AND length(text) >= 300
      AND cast(floor(doc_id / 12) AS bigint) % 4 = 0
    GROUP BY cast(floor(doc_id / 12) AS bigint)
    HAVING count(*) >= 2
"""
