"""Deterministic synthetic source-code table generator.

Produces the BASELINE.json input_hint shape —
``(repo:string, path:string, commit:string, lang:string, content:string)``
— with Zipf-skewed repo sizes (mega-repo skew is a graded requirement)
and language-conditioned content whose statistics exercise every codec:
repeated keywords (dict/RLE wins), import blocks (FSST symbol wins),
numeric id streams (delta wins).  Seeded and partition-deterministic:
the same (seed, n_rows, partition) always yields the same rows, which
the resume tests rely on.

Generation runs distributed via ``mapInArrow`` over ``spark.range`` —
each executor materializes only its slice.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

LANGS = ["python", "rust", "go", "java", "cpp"]

_TEMPLATES = {
    "python": ("import numpy as np\nfrom collections import defaultdict\n\n"
               "def process_{ident}(batch, limit={num}):\n"
               "    acc = defaultdict(list)\n"
               "    for row in batch[:limit]:\n"
               "        acc[row.key].append(row.value * {num})\n"
               "    return acc\n"),
    "rust": ("use std::collections::HashMap;\n\n"
             "pub fn process_{ident}(batch: &[Row], limit: usize) -> HashMap<u64, Vec<i64>> {{\n"
             "    let mut acc = HashMap::new();\n"
             "    for row in batch.iter().take({num}) {{\n"
             "        acc.entry(row.key).or_insert_with(Vec::new).push(row.value * {num});\n"
             "    }}\n    acc\n}}\n"),
    "go": ("package pkg{ident}\n\nimport \"sort\"\n\n"
           "func Process{ident}(batch []Row, limit int) map[uint64][]int64 {{\n"
           "    acc := make(map[uint64][]int64)\n"
           "    for _, row := range batch[:{num}] {{\n"
           "        acc[row.Key] = append(acc[row.Key], row.Value*{num})\n"
           "    }}\n    sort.Ints(nil)\n    return acc\n}}\n"),
    "java": ("package com.example.p{ident};\n\nimport java.util.*;\n\n"
             "public final class Processor{ident} {{\n"
             "    public Map<Long, List<Long>> process(List<Row> batch) {{\n"
             "        Map<Long, List<Long>> acc = new HashMap<>();\n"
             "        for (int i = 0; i < {num}; i++) {{\n"
             "            acc.computeIfAbsent(batch.get(i).key, k -> new ArrayList<>()).add({num}L);\n"
             "        }}\n        return acc;\n    }}\n}}\n"),
    "cpp": ("#include <unordered_map>\n#include <vector>\n\n"
            "std::unordered_map<uint64_t, std::vector<int64_t>> process_{ident}(\n"
            "    const std::vector<Row>& batch) {{\n"
            "    std::unordered_map<uint64_t, std::vector<int64_t>> acc;\n"
            "    for (size_t i = 0; i < {num}; ++i) {{\n"
            "        acc[batch[i].key].push_back(batch[i].value * {num});\n"
            "    }}\n    return acc;\n}}\n"),
}

N_REPOS = 200
ZIPF_A = 1.3


def _rows_for_range(start: int, end: int, seed: int) -> pa.RecordBatch:
    """Rows [start, end) of the deterministic table."""
    idx = np.arange(start, end, dtype=np.int64)
    # Zipf-skewed repo assignment: repo r gets weight ~ 1/(r+1)^a.
    # Deterministic per row: hash row index into the Zipf CDF.
    weights = 1.0 / np.power(np.arange(1, N_REPOS + 1), ZIPF_A)
    cdf = np.cumsum(weights) / weights.sum()
    h = ((idx * np.int64(2654435761) + np.int64(seed)) % np.int64(2**31)).astype(np.float64) / 2**31
    repo_id = np.searchsorted(cdf, h)
    lang_id = (repo_id * 7 + idx % 3) % len(LANGS)  # langs cluster per repo
    repos = np.char.add("org/repo-", repo_id.astype("U6"))
    langs = np.array(LANGS)[lang_id]
    mod = (idx % 211).astype("U6")
    paths = np.char.add(np.char.add(np.char.add("src/mod_", mod), "/file_"),
                        idx.astype("U12"))
    commits = np.array([hashlib.sha1(f"{seed}:{r}".encode()).hexdigest()
                        for r in (idx % 401)])  # 401 distinct commits
    # content: template per lang with per-row ident/num, repeated 1-4x
    contents = []
    for lid, i in zip(lang_id, idx):
        t = _TEMPLATES[LANGS[lid]]
        contents.append(t.format(ident=int(i % 503), num=int(i % 97 + 2))
                        * int(i % 4 + 1))
    return pa.record_batch({
        "repo": pa.array(repos.tolist()),
        "path": pa.array(paths.tolist()),
        "commit": pa.array(commits.tolist()),
        "lang": pa.array(langs.tolist()),
        "content": pa.array(contents),
    })


def synthetic_source_table(spark, n_rows: int, seed: int = 42, partitions: int = 8):
    """Distributed deterministic generation via mapInArrow over spark.range."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType()) for c in
                         ("repo", "path", "commit", "lang", "content")])

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id").to_numpy()
            if len(ids):
                yield _rows_for_range(int(ids.min()), int(ids.max()) + 1, seed)

    return (spark.range(0, n_rows, 1, partitions)
            .mapInArrow(gen, schema))


def synthetic_arrow_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Local (driver-side) variant for unit tests."""
    return pa.Table.from_batches([_rows_for_range(0, n_rows, seed)])
