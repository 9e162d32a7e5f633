"""Pins for the BPE token-accounting operator (pipeline/tokenize.py).

The corpus_token_budget oracle inlines a per-word ground-truth table; these
tests re-derive the merge list AND the table from the frozen word list so
any drift between the executor-side walker and the DuckDB oracle fails here
before it can reach the driver gate.
"""
import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparktika.pipeline.tokenize import (
    CORPUS_WORDS, MERGES, N_MERGES, RANKS, bpe_token_count, merge_ranks,
    text_token_counts, train_bpe, word_token_table)

SF_DIR = "/root/testdata/sf0.001"

# The exact table inlined in the corpus_token_budget oracle SQL.
ORACLE_TABLE = {
    "a": 1, "agg": 1, "batch": 4, "big": 3, "column": 6, "customer": 5,
    "data": 3, "dup": 2, "fast": 2, "filter": 5, "group": 4, "hash": 2,
    "join": 3, "key": 3, "line": 3, "merge": 3, "order": 3, "part": 2,
    "query": 4, "row": 2, "scan": 3, "slow": 3, "small": 3, "sort": 3,
    "spark": 3, "stream": 4, "table": 2, "the": 3, "value": 2,
    "vector": 5, "window": 4,
}


def test_merges_rederive_from_frozen_word_list():
    assert tuple(train_bpe(list(CORPUS_WORDS), N_MERGES)) == MERGES


def test_word_table_matches_oracle_values():
    assert word_token_table() == ORACLE_TABLE


def test_oracle_sql_carries_the_same_table():
    from sparktika.queries import all_oracles
    sql = all_oracles()["corpus_token_budget"]
    for w, n in ORACLE_TABLE.items():
        assert f"('{w}', {n})" in sql


def test_corpus_vocabulary_closed():
    con = duckdb.connect()
    words = {
        r[0] for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) "
            f"FROM '{SF_DIR}/documents.parquet'").fetchall()
    }
    assert words <= set(CORPUS_WORDS)


def test_merge_walk_edges():
    assert bpe_token_count("") == 0
    assert bpe_token_count("z") == 1           # single char, no merges
    assert bpe_token_count("hash") == 2        # ('a','s')->'as', ('as','h')
    # OOV word: walk still applies learned merges, never raises
    assert 1 <= bpe_token_count("zzzerzz") <= 7


def test_text_counts_split_semantics_match_duckdb():
    # consecutive / trailing single-space delimiters yield empty words
    # that count zero on both engines; NULL counts zero
    texts = ["the fast", "the  fast ", "", None, "hash"]
    assert text_token_counts(texts) == [5, 5, 0, 0, 2]
    # cross-check the non-null ones against DuckDB's split + table join
    con = duckdb.connect()
    for t, expect in zip(texts, text_token_counts(texts)):
        if t is None:
            continue
        got = con.execute(
            "WITH wt(word, n_tok) AS (VALUES "
            + ", ".join(f"('{w}', {n})" for w, n in ORACLE_TABLE.items())
            + ") SELECT CAST(sum(COALESCE(n_tok, length(word))) AS BIGINT)"
              " FROM (SELECT unnest(string_split(?, ' ')) AS word)"
              " LEFT JOIN wt USING (word)", [t]).fetchone()[0]
        assert (got or 0) == expect, t


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
               max_size=24))
def test_walk_count_bounds_and_determinism(word):
    n = bpe_token_count(word)
    assert n == bpe_token_count(word)
    if word:
        assert 1 <= n <= len(word)
    else:
        assert n == 0
    # a merge walk never yields more tokens than characters and each
    # merge reduces the count by exactly one: count == len - merges_done
    assert n <= len(word)


def test_ranks_cover_all_merges():
    assert merge_ranks(MERGES) == RANKS
    assert len(RANKS) == len(MERGES) == N_MERGES
