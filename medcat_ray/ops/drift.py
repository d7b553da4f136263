"""Corpus drift / mixture diagnostics: Jensen–Shannon divergence
between per-group unigram word distributions — the statistic a
training-data pipeline tracks across sources or snapshots to catch
distribution shift before training does.

Scale shape: ONE corpus pass (per-block distinct-(group, word) dict
combiner → native ``groupby(group, word).Sum`` — the bpe/word-histogram
shape, shuffle carries distinct pairs); the JS computation runs on the
driver over the groups × vocab table, which is vocabulary-sized, not
corpus-sized.  Tokenization matches ops/bpe.py (``[a-z0-9]+`` over
lowercased text) so the DuckDB twin reuses the same regex."""

from __future__ import annotations

from itertools import combinations
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from medcat_ray.ops.bpe import WORD_RE


def group_word_counts(ds: rd.Dataset, group_col: str,
                      text_col: str = "text") -> rd.Dataset:
    """(group, word, cnt) histogram — one combiner pass + groupby-Sum."""
    def _partial(batch: pa.Table) -> pa.Table:
        acc: Dict[tuple, int] = {}
        for g, t in zip(batch[group_col].to_pylist(),
                        batch[text_col].to_pylist()):
            for w in WORD_RE.findall((t or "").lower()):
                k = (g, w)
                acc[k] = acc.get(k, 0) + 1
        ks = list(acc.keys())
        return pa.table({
            group_col: pa.array([k[0] for k in ks]
                                if ks else [], type=pa.string()),
            "word": pa.array([k[1] for k in ks]
                             if ks else [], type=pa.string()),
            "cnt": pa.array([acc[k] for k in ks] if ks else [],
                            type=pa.int64())})

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby([group_col, "word"]).aggregate(Sum("cnt",
                                                    alias_name="cnt"))


def unigram_js_divergence(ds: rd.Dataset, group_col: str = "source",
                          text_col: str = "text") -> pd.DataFrame:
    """(group_a, group_b, js) for every unordered group pair
    (group_a < group_b): JS divergence (natural log) between the two
    groups' unigram distributions.  Zero-probability terms contribute
    0, exactly as in the SQL twin."""
    hist = group_word_counts(ds, group_col, text_col).to_pandas()
    wide = hist.pivot_table(index="word", columns=group_col,
                            values="cnt", fill_value=0, aggfunc="sum")
    probs = wide / wide.sum(axis=0)
    out_a, out_b, out_js = [], [], []
    for a, b in combinations(sorted(probs.columns), 2):
        p = probs[a].to_numpy()
        q = probs[b].to_numpy()
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            js = 0.5 * np.where(p > 0, p * np.log(p / m), 0.0).sum() \
                + 0.5 * np.where(q > 0, q * np.log(q / m), 0.0).sum()
        out_a.append(a)
        out_b.append(b)
        out_js.append(float(js))
    return pd.DataFrame({"group_a": out_a, "group_b": out_b,
                         "js": out_js})
