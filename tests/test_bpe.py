"""Merge-rank BPE (operators/bpe.py — VERDICT r12 item 4).

The distributed Arrow encoder must match the pure-Python reference
token-for-token on arbitrary inputs (hypothesis property), the
reference itself is pinned on closed-form cases (including the merge-
contention corners the certified oracle's formula was derived from),
and real counts thread through pack_sequences/budget_mixture.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_to_clickhouse_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_word,
    bpe_merge_ranks,
    bpe_token_count,
    char_vocab,
)

MERGES = [("t", "h"), ("th", "e"), ("s", "t")]
RANKS = bpe_merge_ranks(MERGES)
VOCAB = char_vocab(MERGES, "abcdefghijklmnopqrstuvwxyz")


def test_reference_encoder_closed_form_cases():
    # the contention corners the oracle formula rests on
    cases = {
        "the": ["the"],
        "them": ["the", "m"],
        "that": ["th", "a", "t"],
        "other": ["o", "the", "r"],
        "ththe": ["th", "the"],
        "tthe": ["t", "the"],
        "sth": ["s", "th"],  # (t,h) rank 0 beats (s,t)
        "stthe": ["st", "the"],  # st's t is NOT followed by h
        "ssth": ["s", "s", "th"],
        "stst": ["st", "st"],
        "fast": ["f", "a", "st"],
        "a": ["a"],
        "": [],
    }
    for word, want in cases.items():
        assert bpe_encode_word(word, RANKS) == want, word


def test_merge_ranks_rejects_duplicates():
    with pytest.raises(ValueError, match="duplicate"):
        bpe_merge_ranks([("a", "b"), ("a", "b")])


def _closed_form_tokens(word: str) -> int:
    def occ(sub):
        return (len(word) - len(word.replace(sub, ""))) // len(sub)

    return len(word) - occ("th") - occ("the") - (occ("st") - occ("sth"))


@given(
    st.lists(
        st.text(alphabet="sthea", min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=300, deadline=None)
def test_reference_matches_closed_form_formula(words):
    # the oracle's occ() arithmetic equals the real merge loop on the
    # adversarial alphabet (s/t/h/e/a only — maximal merge contention)
    for w in words:
        assert len(bpe_encode_word(w, RANKS)) == _closed_form_tokens(w), w


@given(
    st.lists(
        st.text(alphabet="sthear", min_size=0, max_size=10),
        min_size=0,
        max_size=6,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_spark_encoder_matches_reference(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    got = bpe_encode(df, "text", MERGES, VOCAB).first()["token_ids"]
    want = [
        VOCAB[p]
        for w in text.split()
        for p in bpe_encode_word(w, RANKS)
    ]
    assert got == want


def test_spark_encoder_null_and_unknown(spark):
    df = spark.createDataFrame(
        [(0, "the Zü"), (1, None)], "id long, text string"
    )
    rows = {r["id"]: r["token_ids"] for r in
            bpe_encode(df, "text", MERGES, VOCAB).collect()}
    # 'the' -> [27]; 'Zü' -> two unknown chars -> [-1, -1]
    assert rows[0] == [VOCAB["the"], -1, -1]
    assert rows[1] is None


def test_token_count_stats_oracle_counts_degenerate_docs(spark, tmp_path):
    """The certified bpe_token_count_stats oracle and the engine agree
    on a fixture CONTAINING degenerate documents (ADVICE r13): empty
    and whitespace-only text counts as a 0-token doc on BOTH sides,
    and tab/newline word separators split identically."""
    import duckdb

    from neo4j_to_clickhouse_spark.plans import QUERIES

    rows = [
        (0, "a", "the cat sat"),
        (1, "a", ""),  # empty -> 0 tokens, must still count
        (2, "a", "   "),  # whitespace-only -> 0 tokens
        (3, "b", "st\tthe\nsth"),  # non-space separators
        (4, "b", "this"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    spec = QUERIES["bpe_token_count_stats"]
    got = {
        r["source"]: (
            r["n_docs"], r["bpe_tokens"], r["id_sum"],
            r["min_doc_tokens"], r["max_doc_tokens"],
        )
        for r in spec.spark(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; the driver's fixture is a file
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: tuple(r[1:]) for r in con.execute(spec.oracle).fetchall()
    }
    assert got == want
    # the degenerate docs are actually in play: source 'a' has 3 docs,
    # min 0 tokens
    assert got["a"][0] == 3 and got["a"][3] == 0


def test_token_count_column_and_packing_threading(spark):
    from neo4j_to_clickhouse_spark.operators.text import pack_sequences

    texts = {
        0: "the fast sort",
        1: "that stream",
        2: "other other",
    }
    df = spark.createDataFrame(
        [(i, "g", t) for i, t in texts.items()],
        "doc_id long, source string, text string",
    )
    counted = bpe_token_count(df, "text", MERGES, VOCAB)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in counted.collect()}
    # expectations from the pinned reference encoder, not hand-counted
    ref = {
        i: sum(len(bpe_encode_word(w, RANKS)) for w in t.split())
        for i, t in texts.items()
    }
    assert got == ref
    assert ref[2] == 6  # other = o,the,r twice — spot-pin one value

    # real counts drive packing: budget 8 with counts from BPE
    packed = pack_sequences(
        counted,
        shard_col="source",
        order_col="doc_id",
        budget=8,
        count_col="n_bpe_tokens",
    ).orderBy("doc_id")
    rows = [(r["pack_id"], r["pack_offset"]) for r in packed.collect()]
    starts = [0, ref[0], ref[0] + ref[1]]  # cumulative BPE starts
    assert rows == [(s // 8, s % 8) for s in starts]


def test_regex_pretokenization_splits_punctuation(spark):
    df = spark.createDataFrame(
        [(0, "the, end.")], "id long, text string"
    )
    ws = bpe_encode(df, "text", MERGES, VOCAB).first()["token_ids"]
    rx = bpe_encode(
        df, "text", MERGES, VOCAB, pretokenize="regex"
    ).first()["token_ids"]
    # regex pieces: 'the' ',' 'end' '.' -> the, unk, e, n, d, unk
    assert rx == [
        VOCAB["the"], -1, VOCAB["e"], VOCAB["n"], VOCAB["d"], -1
    ]
    # same ids in whitespace mode HERE (these punctuation marks join
    # no merge), but the boundary matters when punctuation is
    # merge-adjacent: 'e'+'s' merges inside the whitespace pre-token
    # 'apes' but regex keeps 'ape' + 's' apart across "ape,s"? — pin
    # the divergence directly instead:
    assert ws == rx
    m2 = [("e", ",")]
    v2 = char_vocab(m2, "abcdefghijklmnopqrstuvwxyz,")
    df2 = spark.createDataFrame([(0, "the, end")], "id long, text string")
    ws2 = bpe_encode(df2, "text", m2, v2).first()["token_ids"]
    rx2 = bpe_encode(
        df2, "text", m2, v2, pretokenize="regex"
    ).first()["token_ids"]
    # whitespace pre-token 'the,' lets (e,,) merge; regex splits the
    # comma out first, so the merge never fires
    assert v2["e,"] in ws2
    assert v2["e,"] not in rx2
    with pytest.raises(ValueError, match="pretokenize"):
        bpe_encode(df, "text", MERGES, VOCAB, pretokenize="bytes")


def test_learn_bpe_from_counts_pinned():
    from neo4j_to_clickhouse_spark.operators.bpe import (
        learn_bpe_from_counts,
    )

    # hand-derived: r1 (a,a):6 beats (a,b):5; r2 (a,b):5 beats
    # (aa,a):3; r3 only (aa,ab):3 remains
    merges = learn_bpe_from_counts({"aaab": 3, "ab": 2}, 5)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    # count tie -> lexicographically smallest pair
    assert learn_bpe_from_counts({"ab": 2, "cd": 2}, 1) == [("a", "b")]
    # single-char words carry no pairs; early stop
    assert learn_bpe_from_counts({"a": 9, "b": 9}, 3) == []


def test_learn_bpe_distributed_and_roundtrip(spark):
    from neo4j_to_clickhouse_spark.operators.bpe import learn_bpe

    df = spark.createDataFrame(
        [(0, "aaab aaab ab"), (1, "aaab")], "id long, text string"
    ).repartition(5)
    merges = learn_bpe(df, "text", num_merges=5)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    # learned merges drive the certified encoder: 'aaab' collapses to
    # ONE learned piece at encode time (encode merges to fixpoint,
    # unlike training's one-merge-per-round view)
    vocab = char_vocab(merges, "ab")
    got = bpe_encode(df, "text", merges, vocab).collect()
    ids = {r["id"]: r["token_ids"] for r in got}
    assert ids[1] == [vocab["aaab"]]
    assert ids[0] == [vocab["aaab"], vocab["aaab"], vocab["ab"]]


def test_learn_bpe_regex_pretokenization(spark):
    from neo4j_to_clickhouse_spark.operators.bpe import learn_bpe

    # regex mode: punctuation splits out, so the frequent pair is
    # inside the word run, never across the comma
    df = spark.createDataFrame(
        [(0, "ab, ab, ab, cd")], "id long, text string"
    )
    # two merges in whitespace mode: round 1 ties (a,b) vs (b,,) at 3
    # -> lexicographic (a,b); round 2 then merges (ab,,) — a merge
    # ACROSS the word/punctuation boundary that regex mode can never
    # learn (the comma is its own piece there)
    ws = learn_bpe(df, "text", 2)
    rx = learn_bpe(df, "text", 2, pretokenize="regex")
    assert ws == [("a", "b"), ("ab", ",")]
    assert rx == [("a", "b"), ("c", "d")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pretokenize"):
        learn_bpe(df, "text", 1, pretokenize="bytes")


def test_learn_bpe_max_words_truncates_deterministically(spark):
    from neo4j_to_clickhouse_spark.operators.bpe import learn_bpe

    df = spark.createDataFrame(
        [(0, "zz zz zz zz zz yy")], "id long, text string"
    )
    assert learn_bpe(df, "text", 1, max_words=1) == [("z", "z")]


def test_bpe_artifact_roundtrip(tmp_path, spark):
    from neo4j_to_clickhouse_spark.operators.bpe import (
        load_bpe_artifacts,
        save_bpe_artifacts,
    )

    save_bpe_artifacts(MERGES, VOCAB, str(tmp_path / "model"))
    # GPT-2 layout on disk
    lines = (tmp_path / "model" / "merges.txt").read_text().splitlines()
    assert lines[0].startswith("#version")
    assert lines[1:] == ["t h", "th e", "s t"]
    merges, vocab = load_bpe_artifacts(str(tmp_path / "model"))
    assert merges == MERGES
    assert vocab == VOCAB
    # loaded artifacts drive the encoder identically
    df = spark.createDataFrame([(0, "the fast")], "id long, text string")
    a = bpe_encode(df, "text", MERGES, VOCAB).first()["token_ids"]
    b = bpe_encode(df, "text", merges, vocab).first()["token_ids"]
    assert a == b


def test_load_bpe_artifacts_rejects_malformed(tmp_path):
    import pytest as _pytest

    from neo4j_to_clickhouse_spark.operators.bpe import (
        load_bpe_artifacts,
        save_bpe_artifacts,
    )

    save_bpe_artifacts(MERGES, VOCAB, str(tmp_path / "m"))
    with open(tmp_path / "m" / "merges.txt", "a") as fh:
        fh.write("a b c\n")
    with _pytest.raises(ValueError, match="malformed"):
        load_bpe_artifacts(str(tmp_path / "m"))


def test_budget_mixture_consumes_bpe_counts(spark):
    from neo4j_to_clickhouse_spark.operators.sampling import (
        mixture_rates,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", "the the the the")
         for i in range(40)],
        "doc_id long, g string, text string",
    )
    counted = bpe_token_count(df, "text", MERGES, VOCAB)
    # 20 docs * 4 tokens = 80 tokens per group
    rates = {
        r["g"]: r["mixture_rate"]
        for r in mixture_rates(
            counted, "g", {"a": 0.5, "b": 0.25}, 80, "n_bpe_tokens"
        ).collect()
    }
    assert rates["a"] == 0.5  # 80*0.5/80
    assert rates["b"] == 0.25


# --- byte-level GPT-2 mode (VERDICT r13 item 3) -----------------------------


def test_bytes_to_unicode_table():
    """The public GPT-2 byte<->unicode table: 256 entries, bijective,
    identity on printable latin-1, and the published remappings —
    space -> 'Ġ' (U+0120), newline -> 'Ċ' (U+010A), tab -> 'ĉ'."""
    from neo4j_to_clickhouse_spark.operators.bpe import bytes_to_unicode

    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    for b in range(ord("!"), ord("~") + 1):
        assert m[b] == chr(b)
    assert m[ord(" ")] == "Ġ"  # Ġ
    assert m[ord("\n")] == "Ċ"  # Ċ
    assert m[ord("\t")] == "ĉ"  # ĉ
    assert m[0] == "Ā"  # Ā: first remapped byte


def test_gpt2_pretokenizer_published_examples():
    """The released GPT-2 pre-tokenizer's split behavior, hand-derived
    from the published pattern: contraction suffixes split off,
    space prefixes attach to the next run, trailing-whitespace
    lookahead keeps the last space with the following token."""
    import re

    from neo4j_to_clickhouse_spark.operators.bpe import (
        _GPT2_PRETOKEN_RE,
    )

    pat = re.compile(_GPT2_PRETOKEN_RE)
    assert pat.findall("Hello world!") == ["Hello", " world", "!"]
    assert pat.findall("I'm can't") == ["I", "'m", " can", "'t"]
    assert pat.findall("abc123 x9") == ["abc", "123", " x", "9"]
    # double space: the lookahead splits the run so the last space
    # attaches to 'b'
    assert pat.findall("a  b") == ["a", " ", " b"]
    assert pat.findall("a \nb") == ["a", " ", "\n", "b"]


def test_gpt2_byte_level_encode_matches_hand_derivation(spark):
    from neo4j_to_clickhouse_spark.operators.bpe import byte_vocab

    merges = [
        ("Ġ", "t"),
        ("Ġt", "h"),
        ("Ġth", "e"),
        ("l", "l"),
        ("h", "e"),
    ]
    vocab = byte_vocab(merges)
    # byte_vocab layout: 256 base chars then merge products
    assert vocab["!"] == 0
    # 256 base ids (0-255), then merge products in rank order
    assert vocab["Ġt"] == 256
    df = spark.createDataFrame(
        [(0, "the llama"), (1, " the"), (2, "café")],
        "id long, text string",
    )
    rows = {
        r["id"]: r["token_ids"]
        for r in bpe_encode(
            df, "text", merges, vocab, pretokenize="gpt2"
        ).collect()
    }
    # "the" -> pieces t|he ((h,e) is the only applicable merge);
    # " llama" -> Ġ|ll|a|m|a ((l,l) merges, nothing else applies)
    assert rows[0] == [
        vocab["t"], vocab["he"],
        vocab["Ġ"], vocab["ll"], vocab["a"], vocab["m"], vocab["a"],
    ]
    # " the" -> Ġ+t -> Ġt+h -> Ġth+e: the full merge chain
    assert rows[1] == [vocab["Ġthe"]]
    # é is two UTF-8 bytes (0xC3 0xA9 -> 'Ã' '©'), both in the base
    # vocab: byte-level never produces unk
    assert rows[2] == [
        vocab["c"], vocab["a"], vocab["f"], vocab["\xc3"], vocab["\xa9"]
    ]
    assert all(i >= 0 for ids in rows.values() for i in ids)


def test_special_tokens_pass_through(spark):
    from neo4j_to_clickhouse_spark.operators.bpe import byte_vocab

    merges = [("h", "e")]
    vocab = byte_vocab(merges)
    eot = "<|endoftext|>"
    df = spark.createDataFrame(
        [(0, f"he{eot}he"), (1, eot), (2, "he")],
        "id long, text string",
    )
    rows = {
        r["id"]: r["token_ids"]
        for r in bpe_encode(
            df,
            "text",
            merges,
            vocab,
            pretokenize="gpt2",
            special_tokens={eot: 50256},
        ).collect()
    }
    assert rows[2] == [vocab["he"]]
    assert rows[0] == [vocab["he"], 50256, vocab["he"]]
    assert rows[1] == [50256]


def test_gpt2_learn_encode_decode_roundtrip(spark):
    """learn_bpe(pretokenize='gpt2') learns byte-level merges from the
    corpus; encoding with them + byte_vocab is fully reversible back to
    the original text (ids -> pieces -> bytes -> utf-8) — the
    end-to-end interop property published artifacts rely on."""
    from neo4j_to_clickhouse_spark.operators.bpe import (
        byte_vocab,
        bytes_to_unicode,
        learn_bpe,
    )

    texts = [
        "the theme of the thesis",
        "the llama ate the apple",
        "numbers 123 and café too",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    merges = learn_bpe(df, "text", num_merges=12, pretokenize="gpt2")
    assert merges, "learned nothing"
    # every learned merge operates on byte-mapped strings (space
    # appears only as Ġ)
    assert all(" " not in a + b for a, b in merges)
    vocab = byte_vocab(merges)
    enc = bpe_encode(df, "text", merges, vocab, pretokenize="gpt2")
    rev = {v: k for k, v in vocab.items()}
    byte_of = {c: b for b, c in bytes_to_unicode().items()}
    for r in enc.collect():
        pieces = "".join(rev[i] for i in r["token_ids"])
        decoded = bytes(byte_of[ch] for ch in pieces).decode("utf-8")
        assert decoded == texts[r["id"]]


def test_gpt2_artifact_roundtrip_preserves_byte_pieces(spark, tmp_path):
    from neo4j_to_clickhouse_spark.operators.bpe import (
        byte_vocab,
        load_bpe_artifacts,
        save_bpe_artifacts,
    )

    merges = [("Ġ", "t"), ("Ġt", "h")]
    vocab = byte_vocab(merges)
    save_bpe_artifacts(merges, vocab, str(tmp_path / "model"))
    m2, v2 = load_bpe_artifacts(str(tmp_path / "model"))
    assert m2 == merges and v2 == vocab


def _naive_learn(counts, num_merges):
    """The original full-rescan Sennrich loop — kept here as the
    semantics reference the incremental learner must equal."""
    words = {}
    for w, c in counts.items():
        if len(w) >= 2:
            key = tuple(w)
            words[key] = words.get(key, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for parts, c in words.items():
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt = {}
        for parts, c in words.items():
            out, i = [], 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        words = nxt
    return merges


@given(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=300, deadline=None)
def test_incremental_learner_equals_naive_rescan(counts, num_merges):
    from neo4j_to_clickhouse_spark.operators.bpe import (
        learn_bpe_from_counts,
    )

    assert learn_bpe_from_counts(counts, num_merges) == _naive_learn(
        counts, num_merges
    )
