"""Unit tests for the pure-Python UDF kernels (no Spark session needed)."""

from __future__ import annotations

import pytest

from kgspark.chunking import chunk_sentences_py, split_sentences
from kgspark.html_extract import extract_text_py
from kgspark.web_extraction import extract_chunk_py


# ---------------------------------------------------------------- html→text

def test_extract_basic_blocks():
    html = (
        b"<html><body><h1>Title Here</h1><p>One  two\n three.</p>"
        b"<li>item</li></body></html>"
    )
    assert extract_text_py(html) == "Title Here\nOne two three.\nitem"


def test_extract_skips_boilerplate_subtrees():
    html = (
        b"<body><nav>skip me <p>nested skip</p></nav><p>keep</p>"
        b"<script>var x=1;</script><footer>bye</footer></body>"
    )
    assert extract_text_py(html) == "keep"


def test_extract_unescapes_entities():
    assert extract_text_py(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_extract_malformed_unclosed_tag_recovers():
    # html.parser recovery: unclosed <b> inside <p> — text still captured.
    assert extract_text_py(b"<p><b>bold run-on</p><p>next</p>") == (
        "bold run-on\nnext"
    )


def test_extract_non_utf8_and_empty():
    assert extract_text_py(b"\xff\xfe\x00 garbage") == ""
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""


# ---------------------------------------------------------------- chunking

def test_split_sentences():
    assert split_sentences("A b. C d! E?  F") == ["A b.", "C d!", "E?", "F"]
    assert split_sentences("   ") == []


def test_chunk_window_math_no_overlap():
    text = " ".join(f"S{i}." for i in range(12))
    out = chunk_sentences_py(text, group=5, overlap=0)
    assert [c[0] for c in out] == [0, 1, 2]
    assert out[0][1] == "S0. S1. S2. S3. S4."
    assert out[2][1] == "S10. S11."
    assert out[0][2] == 5  # n_tokens = whitespace tokens


def test_chunk_window_math_with_overlap():
    text = " ".join(f"S{i}." for i in range(7))
    out = chunk_sentences_py(text, group=4, overlap=2)
    # step = 2: [0..3], [2..5], [4..6] — stops once the window reaches the end
    assert [c[1] for c in out] == [
        "S0. S1. S2. S3.",
        "S2. S3. S4. S5.",
        "S4. S5. S6.",
    ]


def test_chunk_overlap_ge_group_raises():
    # parity with the reference's guard (utils.rs:57-61)
    with pytest.raises(ValueError):
        chunk_sentences_py("a. b.", group=3, overlap=3)


def test_chunk_empty_text():
    assert chunk_sentences_py("") == []
    assert chunk_sentences_py("   \n ") == []


# ---------------------------------------------------------------- extraction

def test_extract_chunk_entities_first_wins():
    r = extract_chunk_py("London is nice. Ada Lovelace visited London.")
    ents = {e["entity_name"]: e for e in r["entities"]}
    assert set(ents) == {"London", "Ada Lovelace"}
    assert ents["London"]["first_offset"] == 0  # first occurrence kept
    assert ents["London"]["entity_type"] == "Place"


def test_extract_chunk_relationship_resolves_clean_names():
    r = extract_chunk_py("Some title\nAda Lovelace works at Acme Corp.")
    assert len(r["relationships"]) == 1
    rel = r["relationships"][0]
    # subject resolves to the entity nearest the predicate, not the raw span
    assert rel["source_entity"] == "Ada Lovelace"
    assert rel["target_entity"] == "Acme Corp"
    assert rel["relationship_keywords"] == ["works", "at"]
    assert rel["relationship_description"] == "Ada Lovelace works_at Acme Corp"


def test_extract_chunk_unknown_subject_passes_through():
    r = extract_chunk_py("Phantom Widget founded Globex.")
    assert r["relationships"][0]["source_entity"] == "Phantom Widget"


def test_extract_chunk_empty():
    assert extract_chunk_py("") == {"entities": [], "relationships": []}
    assert extract_chunk_py(None or "") == {"entities": [], "relationships": []}


# ----------------------------------------------------- delimiter chunking (W2)

def test_delimiter_chunks_small_pieces_pass_through():
    from kgspark.chunking import chunk_by_delimiter_py

    out = chunk_by_delimiter_py("a b c\n\nd e", max_tokens=10)
    assert out == [(0, "a b c", 3), (1, "d e", 2)]


def test_delimiter_chunks_oversized_piece_rewindowed():
    from kgspark.chunking import chunk_by_delimiter_py

    text = " ".join(f"t{i}" for i in range(12)) + "\n\nshort bit"
    out = chunk_by_delimiter_py(text, max_tokens=5, overlap=0)
    # 12 tokens -> windows [0:5],[5:10],[10:12], then the short piece
    assert [(i, n) for i, _, n in out] == [(0, 5), (1, 5), (2, 2), (3, 2)]
    assert out[2][1] == "t10 t11"


def test_delimiter_chunks_overlap_windows():
    from kgspark.chunking import chunk_by_delimiter_py

    text = " ".join(f"t{i}" for i in range(9))
    out = chunk_by_delimiter_py(text, max_tokens=4, overlap=2)
    # step 2: windows starting 0,2,4,6 — stop once the window reaches the end
    assert [c for _, c, _ in out] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8",
    ]


def test_delimiter_only_keeps_oversized_whole():
    from kgspark.chunking import chunk_by_delimiter_py

    text = " ".join(f"t{i}" for i in range(12))
    out = chunk_by_delimiter_py(text, max_tokens=5, split_by_delimiter_only=True)
    assert out == [(0, text, 12)]


def test_delimiter_chunks_overlap_ge_max_raises():
    from kgspark.chunking import chunk_by_delimiter_py

    with pytest.raises(ValueError):
        chunk_by_delimiter_py("a b", max_tokens=3, overlap=3)


def test_delimiter_chunks_ascii_whitespace_discipline():
    from kgspark.chunking import chunk_by_delimiter_py

    # tabs/newlines around pieces: ASCII-trimmed, tokenized by ASCII \s+
    out = chunk_by_delimiter_py("\ta b\n\nSEP\n c\td \n", delimiter="SEP",
                                max_tokens=10)
    assert out == [(0, "a b", 2), (1, "c\td", 2)]
    # whitespace-only piece is dropped
    assert chunk_by_delimiter_py("x SEP \t\n SEP y", delimiter="SEP",
                                 max_tokens=10) == [(0, "x", 1), (1, "y", 1)]


# ------------------------------------------------------------ learned BPE (F12)

def test_bpe_trainer_deterministic_and_formulations_agree():
    from kgspark.bpe import apply_bpe_greedy, apply_bpe_replay, train_bpe

    texts = ["low low lower lowest", "new newer newest new", "aaa aab aaab"]
    m1 = train_bpe(texts, 12)
    m2 = train_bpe(list(texts), 12)
    assert m1 == m2  # deterministic incl. tie-breaks

    ranks = {p: i for i, p in enumerate(m1)}
    # adversarial words: unseen, overlapping-merge ('aaa'), empty-ish
    for w in ["lowest", "newest", "aaaa", "zzz", "l", "aaab", "xlowx"]:
        assert apply_bpe_greedy(w, ranks) == apply_bpe_replay(w, m1), w


def test_bpe_counts_compress_seen_words():
    from kgspark.bpe import apply_bpe_greedy, train_bpe

    m = train_bpe(["hello hello hello world"], 16)
    ranks = {p: i for i, p in enumerate(m)}
    # a fully-merged training word collapses to one token (+ marker merge)
    assert len(apply_bpe_greedy("hello", ranks)) == 1
    # unseen vocabulary stays character-level-ish (no spurious merges)
    assert len(apply_bpe_greedy("qqq", ranks)) == 4
