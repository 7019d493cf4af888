"""Merge-rank byte-pair encoding: real token ids for the corpus.

Everything upstream of training accounting — shard balance
(`operators/export.py`), sequence packing (`operators/text.py`),
token-budget mixtures (`operators/sampling.py`) — consumes token
counts, and until now the engine only ESTIMATED them (whitespace /
regex pieces / chars÷4, ``tokenizer_comparison_by_source``). This
module produces actual BPE token ids with caller-supplied merges and
vocabulary (the public GPT-2-style artifacts: an ordered merge list +
a token→id map), so those consumers can run on real counts.

Algorithm (Sennrich et al. 2016 as deployed by GPT-2's public
encoder): a word starts as its character sequence; each iteration
finds the LOWEST-RANK adjacent pair present and merges every
occurrence of it; stops when no adjacent pair is in the merge table.
Deterministic for a fixed merge list — any two implementations agree
token-for-token, which is what the certified closed-form oracle and
the property test against :func:`bpe_encode_word` rely on.

100 TB shape: the merge table and vocabulary broadcast once per job
(``SparkContext.broadcast`` — a GPT-2-sized 50k-merge table is ~1 MB);
encoding is ONE Arrow-batched map over the corpus — zero shuffle,
bytes-proportional like the charset/zlib stages. Per-batch unique-word
caching makes the inner loop run once per distinct word per batch, not
per occurrence (natural-language batches repeat most words). Python is
the right tier here, not an escape hatch: the iterative data-dependent
merge loop has no codegen expression form, the same documented
boundary as `operators/charset.py`'s decode stage.

Reference surface parity: the reference pipeline has no tokenizer —
this is beyond-reference capability for the LLM-training-data charter
(SURVEY §8), like dedup/ANN/export.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bpe_merge_ranks",
    "bpe_encode_word",
    "bpe_encode",
    "bpe_token_count",
    "byte_vocab",
    "bytes_to_unicode",
    "char_vocab",
    "corpus_word_counts",
    "gpt2_byte_encode",
    "gpt2_operating_point_artifact",
    "assert_byte_roundtrip",
    "learn_bpe",
    "learn_bpe_from_counts",
    "save_bpe_artifacts",
    "load_bpe_artifacts",
    "synthetic_zipf_counts",
]


def bpe_merge_ranks(
    merges: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    """Merge list (rank order) -> ``{(left, right): rank}``. Duplicate
    pairs are rejected: the rank of a pair must be unambiguous."""
    ranks: dict[tuple[str, str], int] = {}
    for i, pair in enumerate(merges):
        key = (pair[0], pair[1])
        if key in ranks:
            raise ValueError(f"duplicate merge pair {key!r} at rank {i}")
        ranks[key] = i
    return ranks


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Pure-Python reference encoder for ONE pre-token: character
    pieces, then repeatedly merge every occurrence of the lowest-rank
    adjacent pair until none applies. This is the semantics contract —
    the distributed path must match it token-for-token (property test
    in ``tests/test_bpe.py``)."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (parts[i], parts[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


#: regex pre-tokenization (pretokenize="regex"): letter runs, digit
#: runs, single other-punctuation — the Python mirror of the engine's
#: `_PRETOKEN_PATTERN` estimator (plans/queries.py), the simplified
#: ASCII shape of GPT-2's pre-tokenizer (its \p{L}/\p{N} classes and
#: contraction splits need the `regex` module, absent here).
_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"

#: GPT-2's pre-tokenizer (pretokenize="gpt2"), stdlib-re rendering of
#: the published pattern `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|
#: ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+` (Radford et al. 2019's released
#: encoder): contraction suffixes, space-prefixed letter/number/
#: punctuation runs, then whitespace (trailing-run lookahead keeps the
#: last space attached to the NEXT token). `[^\W\d_]` is stdlib re's
#: closest \p{L} (unicode letters); `(?:[^\s\w]|_)` is \p{P|S} plus
#: underscore — exact on ASCII, documented approximation beyond it
#: (the `regex` module with true \p{L} is not in this environment).
_GPT2_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte<->unicode table (Radford et al. 2019,
    released encoder): every byte gets a PRINTABLE unicode character so
    merges/vocab files stay readable — printable latin-1 bytes map to
    themselves, the rest (controls, space, DEL...) map to 256+n in byte
    order. Space (0x20) lands on 'Ġ' (U+0120) — the space-prefix
    convention every published merges.txt assumes — and newline on 'Ċ'.
    Reversible by construction (256 distinct outputs)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_MAP = bytes_to_unicode()


def gpt2_byte_encode(piece: str) -> str:
    """One pre-token -> its byte-level representation: UTF-8 bytes
    through :func:`bytes_to_unicode`. ``' the'`` -> ``'Ġthe'``. This is
    the string the merge loop and the vocabulary operate on in
    byte-level mode, so published GPT-2 ``merges.txt``/``vocab.json``
    artifacts apply semantically, not just by file layout."""
    return "".join(_BYTE_MAP[b] for b in piece.encode("utf-8"))


def _special_pattern(specials: dict[str, int]):
    """Compile the special-token alternation ONCE (longest first) —
    built per Arrow batch, never per document row."""
    import re

    return re.compile(
        "("
        + "|".join(
            re.escape(t)
            for t in sorted(specials, key=len, reverse=True)
        )
        + ")"
    )


def _split_special(
    text: str, specials: dict[str, int], pat
) -> list[tuple[str, int | None]]:
    """Split ``text`` on exact special-token occurrences using the
    precompiled ``pat`` (:func:`_special_pattern`):
    ``[(segment, None) | (special, id), ...]``. Special tokens never
    participate in merges — the standard passthrough contract."""
    out: list[tuple[str, int | None]] = []
    for part in pat.split(text):
        if not part:
            continue
        sid = specials.get(part)
        out.append((part, sid))
    return out


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    out_col: str = "token_ids",
    unk_id: int = -1,
    pretokenize: str = "whitespace",
    special_tokens: dict[str, int] | None = None,
) -> DataFrame:
    """Add ``out_col``: the text's BPE token ids (``array<int>``).

    ``pretokenize="whitespace"`` (default) splits on whitespace — the
    engine's corpus contract everywhere (shingles, spans, packing all
    count whitespace words). ``"regex"`` splits into letter runs /
    digit runs / single punctuation (the GPT-2-style piece shape the
    ``tokenizer_comparison_by_source`` estimator counts), so
    punctuation-bearing text encodes per-piece instead of gluing
    ``word,`` into one pre-token. ``"gpt2"`` is FULL byte-level GPT-2
    semantics (VERDICT r13 item 3): the published pre-tokenizer regex
    (contractions, space-prefixed runs), each pre-token's UTF-8 bytes
    mapped through :func:`bytes_to_unicode` (space-prefix 'Ġ'
    convention), THEN the merge loop — so real ``merges.txt`` /
    ``vocab.json`` artifacts loaded via :func:`load_bpe_artifacts`
    produce the same token ids as the published encoder, and no piece
    can ever miss a char-complete byte vocab. Each pre-token encodes
    independently via the merge loop above; pieces map through
    ``vocab`` (absent pieces -> ``unk_id``, the <unk> convention —
    with a char-complete vocabulary this never fires). NULL text ->
    NULL ids. One Arrow map, zero shuffle; the merge table and vocab
    ride one broadcast each.

    ``special_tokens`` (token string -> id, any mode): exact
    occurrences pass through as their id without participating in
    pre-tokenization or merges — the ``<|endoftext|>`` convention.
    """
    from pyspark.sql.functions import pandas_udf

    if pretokenize not in ("whitespace", "regex", "gpt2"):
        raise ValueError(
            f"pretokenize must be 'whitespace', 'regex' or 'gpt2', "
            f"got {pretokenize!r}"
        )
    ranks = bpe_merge_ranks(merges)
    sc = df.sparkSession.sparkContext
    b_ranks = sc.broadcast(ranks)
    b_vocab = sc.broadcast(dict(vocab))
    b_unk = int(unk_id)
    b_specials = dict(special_tokens) if special_tokens else None
    mode = pretokenize

    @pandas_udf("array<int>")
    def _encode(texts: pd.Series) -> pd.Series:
        import re

        rk = b_ranks.value
        vb = b_vocab.value
        if mode == "regex":
            pat = re.compile(_PRETOKEN_RE)
        elif mode == "gpt2":
            pat = re.compile(_GPT2_PRETOKEN_RE)
        else:
            pat = None
        byte_level = mode == "gpt2"
        spat = (
            _special_pattern(b_specials)
            if b_specials is not None
            else None
        )
        cache: dict[str, list[int]] = {}

        def word_ids(w: str) -> list[int]:
            got = cache.get(w)
            if got is None:
                mapped = gpt2_byte_encode(w) if byte_level else w
                got = [
                    vb.get(p, b_unk)
                    for p in bpe_encode_word(mapped, rk)
                ]
                cache[w] = got
            return got

        def encode_segment(t: str) -> list[int]:
            pieces = pat.findall(t) if pat is not None else t.split()
            ids: list[int] = []
            for w in pieces:
                ids.extend(word_ids(w))
            return ids

        def encode(t):
            if b_specials is None:
                return encode_segment(t)
            ids: list[int] = []
            for seg, sid in _split_special(t, b_specials, spat):
                if sid is not None:
                    ids.append(sid)
                else:
                    ids.extend(encode_segment(seg))
            return ids

        return texts.map(encode, na_action="ignore")

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Add ``out_col``: the REAL token count (``size`` of the encoded
    ids; NULL text -> NULL). The column shard-balance, packing
    (``pack_sequences(count_col=...)``) and mixture planning
    (``budget_mixture(token_col=...)``) should consume once a real
    tokenizer exists — replacing the documented estimators."""
    tmp = f"__{out_col}_ids"
    enc = bpe_encode(
        df, text_col, merges, vocab, out_col=tmp
    )
    return enc.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)


def _merge_parts(
    parts: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Replace every non-overlapping (a, b) adjacency left-to-right."""
    out: list[str] = []
    i = 0
    n = len(parts)
    while i < n:
        if i < n - 1 and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return tuple(out)


def learn_bpe_from_counts(
    counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich-style merge learning over a word-frequency table: each
    round picks the highest-count adjacent-piece pair (weighted by word
    frequency; ties break to the lexicographically smallest pair —
    fully deterministic for a fixed count table), merges every
    occurrence, and records it. Stops early when no adjacent pair
    remains.

    Incremental implementation (the subword-nmt production shape,
    VERDICT r13 item 7): pair counts are maintained as deltas over
    only the words CONTAINING the merged pair (an inverted pair->words
    index), and best-pair selection is a lazily-invalidated heap — so
    a round costs O(affected words + log #pairs), not O(vocab). The
    naive rescan is O(num_merges x vocab): at the GPT-2 operating
    point (50k merges x 100k words) that is ~10^10 piece visits
    (hours), vs a MEASURED 19.4 s for this form
    (docs/evidence/LEARN_BPE_SCALE_r14.json). Semantics are
    byte-for-byte the previous full-rescan loop's (pinned by the
    hand-derived sequences in tests/test_bpe.py and an equivalence
    property test)."""
    import heapq

    words: dict[tuple[str, ...], int] = {}
    for w, c in counts.items():
        if len(w) >= 2:
            key = tuple(w)
            words[key] = words.get(key, 0) + int(c)
    # mutable arrays: the word set is fixed, only the splits evolve
    parts_l: list[tuple[str, ...]] = list(words.keys())
    count_l: list[int] = [words[p] for p in parts_l]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, parts in enumerate(parts_l):
        c = count_l[wi]
        for i in range(len(parts) - 1):
            p = (parts[i], parts[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best)
        if cur is None or -negc != cur:
            continue  # stale heap entry — current count was re-pushed
        merges.append(best)
        a, b = best
        touched: set[tuple[str, str]] = set()
        for wi in sorted(pair_words.get(best, ())):
            parts = parts_l[wi]
            c = count_l[wi]
            new_parts = _merge_parts(parts, a, b)
            # retract the old split's contributions, add the new's
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                left = pair_counts[p] - c
                if left:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
                touched.add(p)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            parts_l[wi] = new_parts
            for i in range(len(new_parts) - 1):
                p = (new_parts[i], new_parts[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                touched.add(p)
                pair_words.setdefault(p, set()).add(wi)
        for p in touched:
            c2 = pair_counts.get(p)
            if c2 is not None:
                heapq.heappush(heap, (-c2, p))
    return merges


def learn_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    max_words: int = 100_000,
    pretokenize: str = "whitespace",
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus — the training side of
    :func:`bpe_encode`.

    Split of labor (how production tokenizer trainers work, and the
    posture `operators/lm.py` uses for its top-V remap): the CORPUS
    pass is one distributed word-frequency aggregate — the only part
    proportional to corpus size; the merge loop then runs on the
    count table, which is VOCABULARY-sized (Heaps' law: ~millions of
    rows for a 100 TB corpus, not trillions), truncated to the
    ``max_words`` most frequent words (count desc, word asc — a
    deterministic vocab-sized sort, nowhere near the corpus).
    Integer counts make the whole path bit-deterministic across any
    partitioning; the loop itself is :func:`learn_bpe_from_counts`,
    pinned by pytest.

    ``pretokenize`` MUST match the mode later passed to
    :func:`bpe_encode` — merges learned over whitespace words apply
    differently to regex pieces (punctuation boundaries shift which
    pairs are adjacent). ``"gpt2"`` learns BYTE-LEVEL merges: the
    corpus aggregate splits with the SAME compiled
    ``_GPT2_PRETOKEN_RE`` the encoder uses, applied in one Arrow map —
    learn==encode parity is by construction, not by hoping two regex
    engines' ``\\p{L}`` approximations agree (they don't beyond ASCII:
    Java's ``\\p{L}``/``\\p{N}`` and Python's ``[^\\W\\d_]``/``\\d``
    classify e.g. U+00B9 differently, which would shift merge
    adjacency between training and encoding). The vocab-bounded count
    table is then byte-mapped (:func:`gpt2_byte_encode`) before the
    merge loop, so the learned ``merges.txt`` speaks the same
    'Ġ'-convention as published artifacts.
    """
    return learn_bpe_from_counts(
        corpus_word_counts(
            df, text_col, max_words=max_words, pretokenize=pretokenize
        ),
        num_merges,
    )


def corpus_word_counts(
    df: DataFrame,
    text_col: str,
    max_words: int = 100_000,
    pretokenize: str = "whitespace",
) -> dict[str, int]:
    """The corpus half of :func:`learn_bpe`, exposed on its own: ONE
    distributed word-frequency aggregate truncated to the ``max_words``
    most frequent words (count desc, word asc — deterministic), with
    ``pretokenize="gpt2"`` counts keyed by the BYTE-MAPPED word (the
    form :func:`learn_bpe_from_counts` consumes). Use it to compose a
    corpus's real counts with additional vocabulary before learning
    (e.g. the production-operating-point bench unions a synthetic
    vocabulary tail to reach a 50k-merge table on a small fixture)."""
    if pretokenize == "whitespace":
        pieces = F.split(
            F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""),
            r"\s+",
        )
    elif pretokenize == "regex":
        pieces = F.regexp_extract_all(
            F.col(text_col), F.lit(_PRETOKEN_RE), 0
        )
    elif pretokenize == "gpt2":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def _gpt2_split(texts: pd.Series) -> pd.Series:
            import re

            pat = re.compile(_GPT2_PRETOKEN_RE)
            return texts.map(pat.findall, na_action="ignore")

        pieces = _gpt2_split(F.col(text_col))
    else:
        raise ValueError(
            f"pretokenize must be 'whitespace', 'regex' or 'gpt2', "
            f"got {pretokenize!r}"
        )
    rows = (
        df.select(F.explode(pieces).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    counts = {r["w"]: r["c"] for r in rows}
    if pretokenize == "gpt2":
        mapped: dict[str, int] = {}
        for w, c in counts.items():
            m = gpt2_byte_encode(w)
            mapped[m] = mapped.get(m, 0) + c
        counts = mapped
    return counts


def synthetic_zipf_counts(
    n_words: int = 100_000, seed: int = 0, head_count: int = 10_000
) -> dict[str, int]:
    """Deterministic synthetic byte-mapped word-count table — the
    GPT-2 OPERATING-POINT fixture (50k merges need a ~100k-word
    vocabulary; the test corpus has only dozens of distinct words, so
    production-shape learn/encode benches union this tail under the
    real corpus counts). Words are 'Ġ'-prefixed md5-derived letter
    strings of length 3-10 (already byte-mapped form — ASCII letters
    map to themselves); counts follow a Zipf curve from ``head_count``
    down to 1, so merge ranks densify realistically. Purely synthetic
    timing/shape data — correctness lanes never touch it."""
    import hashlib as _hl

    counts: dict[str, int] = {}
    i = 0
    while len(counts) < n_words:
        h = _hl.md5(f"zipf:{seed}:{i}".encode()).hexdigest()
        n = 3 + int(h[:2], 16) % 8
        w = "Ġ" + "".join(
            chr(ord("a") + int(c, 16) % 16) for c in h[2 : 2 + n]
        )
        i += 1
        if w in counts:
            continue
        rank = len(counts) + 1
        counts[w] = max(1, int(head_count / rank**0.7))
    return counts


def gpt2_operating_point_artifact(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50_000,
    n_synthetic_words: int = 100_000,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """A PRODUCTION-SIZED (merges, vocab) pair for benches and scale
    probes: the corpus's real byte-mapped word counts unioned over the
    deterministic :func:`synthetic_zipf_counts` tail, learned by the
    real incremental Sennrich loop. The real words' counts dominate
    the top ranks so their chains fully merge (encode on real text
    walks real merge chains), while the synthetic tail densifies the
    table to the GPT-2 operating point (50k merges → vocab 50256).
    Shared by ``bench.py::_bpe_prod_jobs`` and
    ``tools/bench_bpe_encode_50k.py`` so the two cannot drift."""
    counts = synthetic_zipf_counts(n_synthetic_words)
    for w, c in corpus_word_counts(
        df, text_col, pretokenize="gpt2"
    ).items():
        counts[w] = counts.get(w, 0) + c
    merges = learn_bpe_from_counts(counts, num_merges)
    return merges, byte_vocab(merges)


def assert_byte_roundtrip(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    n_docs: int = 50,
) -> None:
    """Pin the ids → pieces → bytes → utf-8 round-trip on a sample of
    ``df`` — the cheap full-vocab integrity check benches run in their
    untimed prepare. Raises AssertionError on the first divergence."""
    rev = {v: k for k, v in vocab.items()}
    byte_of = {c: b for b, c in bytes_to_unicode().items()}
    sample = bpe_encode(
        df.limit(n_docs), text_col, merges, vocab, pretokenize="gpt2"
    ).select(text_col, "token_ids")
    for r in sample.collect():
        pieces = "".join(rev[i] for i in r["token_ids"])
        got = bytes(byte_of[ch] for ch in pieces).decode("utf-8")
        if got != r[text_col]:
            raise AssertionError(
                "byte round-trip diverged: "
                f"{got[:60]!r} != {r[text_col][:60]!r}"
            )


def save_bpe_artifacts(
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    path: str,
) -> None:
    """Write the model in the GPT-2 artifact layout — ``merges.txt``
    (one ``left right`` pair per line, rank order, ``#version`` header)
    and ``vocab.json`` (piece -> id) — so trained tables interoperate
    with standard tokenizer tooling. Local-filesystem paths (model
    artifacts are driver-side, like the checkpoint configs)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, ".merges.txt.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    os.replace(tmp, os.path.join(path, "merges.txt"))
    tmp = os.path.join(path, ".vocab.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    os.replace(tmp, os.path.join(path, "vocab.json"))


def load_bpe_artifacts(
    path: str,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Read ``merges.txt`` + ``vocab.json`` back (the GPT-2 layout —
    including files produced by standard tooling). Comment/blank lines
    in merges.txt are skipped; a merge line must be exactly two
    space-separated pieces."""
    import json
    import os

    merges: list[tuple[str, str]] = []
    with open(
        os.path.join(path, "merges.txt"), encoding="utf-8"
    ) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"malformed merges.txt line: {line!r}"
                )
            merges.append((parts[0], parts[1]))
    with open(
        os.path.join(path, "vocab.json"), encoding="utf-8"
    ) as fh:
        vocab = {str(k): int(v) for k, v in json.load(fh).items()}
    return merges, vocab


def byte_vocab(
    merges: list[tuple[str, str]] = (),
) -> dict[str, int]:
    """Byte-level base vocabulary + merge products, ids dense in GPT-2
    layout order: the 256 byte characters first (printables, then the
    256+n remapped bytes — exactly :func:`bytes_to_unicode`'s insertion
    order, which is why released GPT-2 vocab.json starts '!'=0), then
    one id per merge product. Char-complete by construction: byte-level
    encoding can never hit ``unk_id``."""
    vocab: dict[str, int] = {}
    for ch in bytes_to_unicode().values():
        vocab[ch] = len(vocab)
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return vocab


def char_vocab(
    merges: list[tuple[str, str]], alphabet: str
) -> dict[str, int]:
    """Vocabulary covering ``alphabet``'s characters plus every merge
    product, ids dense in that order — the micro-vocab builder for
    closed-form fixtures and tests (a real deployment supplies its
    trained vocab.json instead)."""
    vocab: dict[str, int] = {}
    for ch in alphabet:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return vocab
