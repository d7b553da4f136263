"""PII redaction (ops/pii.py) and sequence packing (ops/packing.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.packing import pack_sequences, packing_oracle_sql
from medcat_ray.ops.pii import DEFAULT_PII_PATTERNS, redact_pii


@pytest.fixture()
def pii_docs():
    return pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["mail me at john.doe+x@ex-ample.co.uk now",
                 "call (555) 123-4567 or 555.123.4567 or 555 123 4567",
                 "server 192.168.1.100 and 10.0.0.1 up; email a@b.io",
                 "no pii here 1234",
                 ""],
    })


def test_redact_pii_matches_duckdb(ray_session, pii_docs):
    got = redact_pii(rd.from_pandas(pii_docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pii_docs)
    q = "SELECT doc_id, text AS t FROM documents"
    sel = ["doc_id"]
    for name, pat, repl in DEFAULT_PII_PATTERNS:
        q = (f"SELECT * EXCLUDE (t),"
             f" len(regexp_extract_all(t, '{pat}')) AS n_{name},"
             f" regexp_replace(t, '{pat}', '{repl}', 'g') AS t"
             f" FROM ({q})")
        sel.append(f"CAST(n_{name} AS BIGINT) AS n_{name}")
    exp = con.execute(
        f"SELECT {', '.join(sel)}, t AS redacted_text FROM ({q})"
        f" ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_redact_pii_counts_and_order(ray_session):
    # an IP-shaped host inside an email is consumed by <EMAIL> first
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a@10.0.0.99.net but 10.0.0.99 is bare",
                                "x@1.2.3.44 is no email (digit TLD)"]})
    out = redact_pii(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_ips"] == 1
    assert out.loc[0, "redacted_text"] == "<EMAIL> but <IP> is bare"
    assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_ips"] == 1
    assert out.loc[1, "redacted_text"] == "x@<IP> is no email (digit TLD)"


def test_redact_pii_null_text(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": [None, "a@b.io"]})
    out = redact_pii(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "redacted_text"] == ""
    assert out.loc[1, "n_emails"] == 1


@pytest.fixture()
def pack_docs():
    return pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": ["hello world " * 40,     # multiple full blocks
                 "",                       # zero tokens -> zero rows
                 "one",                    # single ragged block
                 "a b c d e f g",
                 None,                     # null text -> zero rows
                 "tab\tsep and\nnewline tokens " * 10,
                 "unicode été café " * 5,
                 "x " * 129],              # 129 tokens -> ragged tail
    })


def test_pack_sequences_matches_duckdb(ray_session, pack_docs):
    got = pack_sequences(rd.from_pandas(pack_docs), block_size=16) \
        .to_pandas().sort_values(["doc_id", "block_idx"]) \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pack_docs)
    exp = con.execute(packing_oracle_sql(block_size=16)).df()
    pd.testing.assert_frame_equal(
        got, exp.astype(got.dtypes.to_dict()), check_like=True)


def test_pack_sequences_block_arithmetic(ray_session):
    df = pd.DataFrame({"doc_id": [7], "text": ["w " * 130]})
    out = pack_sequences(rd.from_pandas(df), block_size=64).to_pandas() \
        .sort_values("block_idx").reset_index(drop=True)
    assert list(out["block_idx"]) == [0, 1, 2]
    assert list(out["block_tokens"]) == [64, 64, 2]
    # identical tokens -> full blocks share one checksum, and the ragged
    # tail's checksum is (2/64) of it under exact mod-2^64 arithmetic
    assert out.loc[0, "block_hash"] == out.loc[1, "block_hash"]
    from medcat_ray.ops.hashing import poly_hashes
    h = int(poly_hashes(["w"])[0])
    assert out.loc[2, "block_hash"] == (2 * h) % (1 << 64) % (1 << 63)
    assert out.loc[0, "block_hash"] == (64 * h) % (1 << 64) % (1 << 63)
