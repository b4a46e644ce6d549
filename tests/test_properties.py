"""Property-based tests (hypothesis) for the pure algorithmic kernels —
driver-side pieces that underpin distributed operators, checked against
independent naive implementations over random inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---- union-find labeling (dedup.dup_clusters fast path) -------------------


def _naive_components(edges):
    """BFS connected components -> {node: min_node_in_component}."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    seen = set()
    for start in adj:
        if start in seen:
            continue
        comp, queue = [], [start]
        seen.add(start)
        while queue:
            x = queue.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    queue.append(y)
        lab = min(comp)
        for x in comp:
            out[x] = lab
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_union_find_matches_bfs(edges):
    # replicate dup_clusters' union-find kernel on the undirected edge set
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    undirected = [(a, b) for a, b in edges if a != b]
    for a, b in undirected:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    got = {x: find(x) for x in parent}
    assert got == _naive_components(undirected)


# ---- sequence packing boundary math (ranking.pack_sequences) --------------


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(1, 64),
)
@settings(max_examples=200, deadline=None)
def test_pack_offsets_partition_the_stream(token_counts, budget):
    # start offsets are the exclusive prefix sums; pack ids never decrease
    # and adjacent packs differ by at most ceil(n_i/budget) steps
    offsets, acc = [], 0
    for n in token_counts:
        offsets.append(acc)
        acc += n
    packs = [o // budget for o in offsets]
    assert packs == sorted(packs)
    assert packs[0] == 0
    total_packs = packs[-1] + 1
    assert total_packs <= max(1, -(-acc // budget)) + 1


# ---- spherical k-means (similarity._spherical_kmeans) ---------------------


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_spherical_kmeans_deterministic_and_unit(seed):
    import numpy as np

    from fireworks_spark.operators.similarity import _spherical_kmeans

    rng = np.random.default_rng(123)
    X = rng.standard_normal((80, 8))
    C1 = _spherical_kmeans(X, 5, seed)
    C2 = _spherical_kmeans(X, 5, seed)
    assert np.array_equal(C1, C2)  # same seed -> identical centroids
    norms = np.linalg.norm(C1, axis=1)
    assert np.allclose(norms, 1.0)  # centroids live on the unit sphere


# ---- bm25/tf-idf idf monotonicity -----------------------------------------


@given(st.integers(1, 10_000), st.integers(1, 10_000))
@settings(max_examples=200, deadline=None)
def test_lucene_idf_nonnegative_and_monotone(n_docs, df):
    df = min(df, n_docs)
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    assert idf >= 0.0
    if df < n_docs:
        rarer = math.log(1 + (n_docs - (df + 1) + 0.5) / (df + 1 + 0.5))
        assert rarer <= idf


# ---- line dedup (dedup.line_dedup) ----------------------------------------


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=5),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_line_dedup_matches_python_reference(spark, doc_lines):
    from fireworks_spark.operators import dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_kept"])
        for r in dedup.line_dedup(d).collect()
    }
    seen: set = set()
    for i, (_, text) in enumerate(rows):
        kept = []
        for line in text.split("\n"):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        assert got[i] == ("\n".join(kept), len(kept))


# ---- funnel run-collapse neutrality (timeagg._funnel_event_arrays) --------


def _greedy_reach(events, steps):
    """Reference greedy funnel over (ts, type)-sorted events (strictly
    increasing matched timestamps)."""
    r, last = 0, None
    for t, y in sorted(events):
        if r < len(steps) and y == steps[r] and (last is None or t > last):
            r += 1
            last = t
    return r


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 6),          # coarse ts -> forced ties
            st.sampled_from(["A", "B", "C", "X"]),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=10, deadline=None)
def test_funnel_run_collapse_is_reach_neutral(spark, events):
    """Random event sets WITH timestamp ties: the guard's exact
    run-collapse (cap set high enough never to truncate) must reproduce
    the plain greedy reach for every key — the tie-conservative keep rule
    (other >= own) is the part no closed-form test pins as hard as random
    search does."""
    import datetime as dt

    from fireworks_spark.operators.timeagg import funnel_counts

    steps = ["A", "B", "C"]
    rows = [
        (u, dt.datetime(2024, 1, 1, 0, 0, t), y) for u, t, y in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.step: r.users
        for r in funnel_counts(
            df, steps, max_events_per_key=1000
        ).collect()
    }
    per_key: dict = {}
    for u, t, y in events:
        per_key.setdefault(u, []).append((t, y))
    reach = {u: _greedy_reach(evs, steps) for u, evs in per_key.items()}
    for step in (1, 2, 3):
        assert got[step] == sum(1 for r in reach.values() if r >= step)


# ---- alignment parser grammars (sources stockholm/nexus) -------------------

_name_st = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_.-"
    ),
    min_size=1,
    max_size=16,
)
_seq_st = st.text(alphabet="ACGTN-.?", min_size=1, max_size=40)


@given(
    st.dictionaries(_name_st, _seq_st, min_size=1, max_size=8),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_parse_stockholm_recovers_interleaved_records(records, wrap):
    """Any record set emitted as interleaved Stockholm blocks (chunks of
    `wrap` sites, annotation noise interspersed) parses back exactly."""
    from fireworks_spark.sources import _parse_stockholm

    names = sorted(records)
    longest = max(len(records[n]) for n in names)
    lines = ["# STOCKHOLM 1.0", "#=GF ID RANDOM"]
    for n in names:
        lines.append(f"#=GS {n} DE desc of {n}")
    for off in range(0, longest, wrap):
        lines.append("")
        for n in names:
            chunk = records[n][off:off + wrap]
            if chunk:
                lines.append(f"{n}  {chunk}")
        lines.append("#=GC SS_cons " + "." * wrap)
    lines.append("//")
    pairs, descs = _parse_stockholm("\n".join(lines) + "\n")
    assert {n: "".join(cs) for n, cs in pairs} == records
    assert descs == {n: f"desc of {n}" for n in names}


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                    whitelist_characters="_. -",
                ),
                min_size=1,
                max_size=16,
            ).filter(lambda s: s.strip() == s and "'" not in s),
            st.text(alphabet="ACGTN-?", min_size=1, max_size=40),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_parse_nexus_recovers_interleaved_matrix(rows, wrap):
    """Any taxon set emitted as an interleaved NEXUS matrix (names quoted
    when they contain spaces, bracket comments sprinkled in) parses back
    exactly."""
    from fireworks_spark.sources import _parse_nexus

    longest = max(len(s) for _, s in rows)
    out = [
        "#NEXUS",
        "[generated [nested comment]",
        "spanning lines]",
        "begin data;",
        f"  dimensions ntax={len(rows)} nchar={longest};",
        "  format datatype=standard gap=- missing=?;",
        "  matrix",
    ]
    for off in range(0, longest, wrap):
        for name, seq in rows:
            chunk = seq[off:off + wrap]
            if chunk:
                q = f"'{name}'" if " " in name else name
                out.append(f"    {q}  {chunk} [site {off}]")
        out.append("")
    out += ["  ;", "end;"]
    got = _parse_nexus("\n".join(out) + "\n")
    assert {n: "".join(cs) for n, cs in got} == dict(rows)


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_alignment_parsers_fail_closed_on_arbitrary_text(text):
    """Grammar fuzz: every whole-file alignment parser either parses or
    raises ValueError — no IndexError/TypeError/StopIteration escapes on
    malformed input (parsers run executor-side where a foreign exception
    type surfaces as an opaque PythonException)."""
    from fireworks_spark.sources import (
        _parse_ace,
        _parse_clustal,
        _parse_nexus,
        _parse_stockholm,
    )

    for parse in (_parse_stockholm, _parse_nexus, _parse_ace, _parse_clustal):
        try:
            parse(text)
        except ValueError:
            pass


@given(
    st.text(
        alphabet="ACGT*#=/GSDE \n0123456789OBQUFRmatrixends;[]'\"-. ",
        max_size=400,
    )
)
@settings(max_examples=400, deadline=None)
def test_alignment_parsers_fail_closed_on_formatlike_text(text):
    """Same, over an alphabet biased toward the formats' own control
    tokens (headers, counts, annotations) so the fuzz actually reaches
    the deep branches instead of failing at the header check."""
    from fireworks_spark.sources import (
        _parse_ace,
        _parse_clustal,
        _parse_nexus,
        _parse_stockholm,
    )

    for header, parse in (
        ("# STOCKHOLM 1.0\n", _parse_stockholm),
        ("#NEXUS\n", _parse_nexus),
        ("AS 1 1\n", _parse_ace),
        ("CLUSTAL W (1.0)\n", _parse_clustal),
    ):
        try:
            parse(header + text)
        except ValueError:
            pass


# ---- FASTQ byte-range splitter (sources._fastq_parse_range) ---------------


@given(
    st.lists(
        st.tuples(
            st.integers(1, 40),  # sequence length
            st.sampled_from(["plain", "at", "plus"]),  # quality first char
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(8, 400),  # chunk size in bytes
)
@settings(max_examples=60, deadline=None)
def test_fastq_range_split_is_exactly_the_whole_parse(recs, chunk):
    """Every byte-range decomposition of a FASTQ file parses to EXACTLY
    the records of the whole-file parse, in order, once each — including
    quality lines that START with '@' (a legal Phred 31) or '+' and
    chunk boundaries landing anywhere (mid-line, on record heads, on the
    final newline). This is the ownership-rule invariant of
    read_fastq_ranged: a record belongs to the range (start, end] holding
    its first byte (offset 0 to the first range)."""
    import os
    import tempfile

    import pandas as pd

    from fireworks_spark.sources import _fastq_parse_range

    lines = []
    want = []
    for i, (n, qkind) in enumerate(recs):
        seq = ("ACGTNacgt-" * 5)[:n]
        first = {"plain": "I", "at": "@", "plus": "+"}[qkind]
        qual = (first + "!#J~" * 12)[:n]
        lines.append(f"@r{i} d{i}\n{seq}\n+\n{qual}\n")
        want.append((f"r{i}", f"r{i} d{i}", seq, qual))
    data = "".join(lines).encode()

    fd, path = tempfile.mkstemp(suffix=".fastq")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        got = []
        for start in range(0, len(data), chunk):
            end = min(start + chunk, len(data))
            for pdf in _fastq_parse_range(path, start, end, pd):
                got.extend(
                    zip(pdf["ids"], pdf["descriptions"],
                        pdf["sequences"], pdf["qualities"])
                )
        assert got == want
    finally:
        os.unlink(path)


# ---- round-12 sources: ig / phd / pdb / nib ---------------------------------


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_r12_parsers_fail_closed_on_arbitrary_text(text):
    """Grammar fuzz for the round-12 record parsers: parse or ValueError,
    no foreign exception types (same contract as the alignment parsers —
    these run executor-side where IndexError/KeyError surface as opaque
    PythonExceptions)."""
    from fireworks_spark.sources import (
        _parse_ig,
        _parse_pdb_atom,
        _parse_pdb_seqres,
        _parse_phd,
    )

    for parse in (_parse_ig, _parse_phd, _parse_pdb_seqres, _parse_pdb_atom):
        try:
            parse(text)
        except ValueError:
            pass


@given(
    st.text(
        alphabet=(
            ";ACGT 0123456789\nBEGIN_SEQUENCE DNA END ATOM SEQRES HEADER "
            "ALA GLY abcdef."
        ),
        max_size=400,
    )
)
@settings(max_examples=400, deadline=None)
def test_r12_parsers_fail_closed_on_formatlike_text(text):
    """Same, biased toward the formats' own control tokens so the fuzz
    reaches the deep branches (DNA blocks, SEQRES fields, ATOM columns)
    instead of dying at the first-line check."""
    from fireworks_spark.sources import (
        _parse_ig,
        _parse_pdb_atom,
        _parse_pdb_seqres,
        _parse_phd,
    )

    for prefix, parse in (
        ("; c\nt1\n", _parse_ig),
        ("BEGIN_SEQUENCE r1\nBEGIN_DNA\n", _parse_phd),
        ("HEADER    X\n", _parse_pdb_seqres),
        ("HEADER    X\n", _parse_pdb_atom),
    ):
        try:
            parse(prefix + text)
        except ValueError:
            pass


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                    max_codepoint=127,
                ),
                min_size=1,
                max_size=12,
            ),
            st.text(alphabet="ACGT12", min_size=1, max_size=50),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=120, deadline=None)
def test_ig_write_read_text_roundtrip(records):
    """write_ig's serialization and _parse_ig invert each other for any
    name/sequence — including sequences that END in the topology digits
    '1'/'2', which the always-appended terminator protects."""
    from fireworks_spark.sources import _parse_ig

    out = []
    for name, seq in records:
        out.append(f";d {name}\n{name}\n")
        body = seq + "1"
        for j in range(0, len(body), 7):
            out.append(body[j : j + 7] + "\n")
    got = _parse_ig("".join(out))
    assert [(n, s) for n, _, s in got] == list(records)
    assert all(d == f"d {n}" for n, d, _ in got)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="acgtn", min_size=1, max_size=30),
            st.integers(0, 99),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=120, deadline=None)
def test_phd_write_read_text_roundtrip(seq_qual):
    """write_phd's record layout and _parse_phd invert each other; every
    per-base score survives."""
    from fireworks_spark.sources import _parse_phd

    out = []
    for i, (seq, q) in enumerate(seq_qual):
        out.append(f"BEGIN_SEQUENCE r{i}\n\nBEGIN_COMMENT\n\nEND_COMMENT\n\n"
                   "BEGIN_DNA\n")
        for j, c in enumerate(seq):
            out.append(f"{c} {(q + j) % 100} {j + 1}\n")
        out.append("END_DNA\n\nEND_SEQUENCE\n\n")
    got = _parse_phd("".join(out))
    assert [(n, s) for n, s, _ in got] == [
        (f"r{i}", seq) for i, (seq, _) in enumerate(seq_qual)
    ]
    for (_, _, quals), (seq, q) in zip(got, seq_qual):
        assert quals == [(q + j) % 100 for j in range(len(seq))]


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_nib_decode_fails_closed_on_arbitrary_bytes(buf):
    """The nib binary decode: arbitrary bytes either decode to the
    TCAGN/tcagn alphabet or raise ValueError — magic, declared length
    and nibble codes are all validated."""
    from fireworks_spark.sources import _parse_nib

    try:
        s = _parse_nib(buf)
        assert set(s) <= set("TCAGNtcagn")
    except ValueError:
        pass


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_twobit_decode_fails_closed_on_arbitrary_bytes(buf):
    """The 2bit binary decode: arbitrary bytes (raw, and grafted onto a
    valid little-endian header so the fuzz reaches the index and record
    branches) either decode or raise ValueError — including block runs
    that exceed dnaSize, which must never attempt the overlay
    allocation."""
    import struct

    from fireworks_spark.sources import _parse_twobit

    headered = struct.pack("<IIII", 0x1A412743, 0, 2, 0) + buf
    for candidate in (buf, headered):
        try:
            recs = _parse_twobit(candidate)
            for _, s in recs:
                assert set(s) <= set("TCAGNtcagn")
        except ValueError:
            pass


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_cif_parsers_fail_closed_on_arbitrary_text(text):
    """The mmCIF tokenizer + both sequence views: parse or ValueError,
    never a foreign exception type (executor-side contract, same as the
    alignment and r12 record parsers)."""
    from fireworks_spark.sources import _parse_cif_atom, _parse_cif_seqres

    for parse in (_parse_cif_seqres, _parse_cif_atom):
        try:
            parse(text)
        except ValueError:
            pass


@given(
    st.text(
        alphabet="_.\n '\"#;loop_datASTRMET 0123456789entity",
        max_size=300,
    )
)
@settings(max_examples=300, deadline=None)
def test_cif_parsers_fail_closed_on_formatlike_text(text):
    """Same, biased toward CIF control tokens (tags, loop_, quotes,
    ';' text fields) so the fuzz reaches the loop/value branches."""
    from fireworks_spark.sources import _parse_cif_atom, _parse_cif_seqres

    prefix = "data_x\nloop_\n_entity_poly_seq.entity_id\n"
    for parse in (_parse_cif_seqres, _parse_cif_atom):
        try:
            parse(prefix + text)
        except ValueError:
            pass
