"""Round-6 optimization pin: the token-driven fast content interpreter
(textextract._text_fast) must be byte-identical to the parse-based exact
interpreter (_text_exact) on every stream the fast path accepts, and bail
(_FallBack) on every construct it does not replicate — never silently
diverge. A 150k-trial adversarial fuzz of the same generator ran clean at
change time (OPTIMIZATION_r06.md); this keeps a deterministic 3k-trial
slice in CI plus the hand-picked edge cases that caught real divergences
during development."""

import random

import pytest

import pdf4py_spark.kernel.textextract as TE


def _both(data: bytes):
    """(fast_result, exact_result) as ('ok', bytes) / ('exc', name);
    a _FallBack from the fast path re-runs exact by construction, so it
    counts as agreement."""
    def run(fn):
        try:
            return ("ok", fn(data))
        except Exception as exc:  # noqa: BLE001 - comparing outcomes
            return ("exc", type(exc).__name__)

    try:
        fast = ("ok", TE._text_fast(data))
    except TE._FallBack:
        return None, None  # exact path used either way
    except Exception as exc:  # noqa: BLE001
        fast = ("exc", type(exc).__name__)
    return fast, run(TE._text_exact)


EDGE_CASES = [
    # show op whose effect must survive a trailing EOF (StopIteration
    # delivers the operator; a TokenError does not)
    b"BT (a) Tj",
    b"BT (a) Tj \xff (b) Tj",
    # ref lookahead: Ref is an opaque operand, bare R clears
    b"(keep) 1 0 R Tj",
    b"(gone) R Tj",
    # int lookahead consuming the array terminator
    b"[ (a) -250 (b) 42 7 ] TJ",
    b"[5] TJ",
    b"[1 0 R (x)] TJ",
    # bool participates in the int lookahead as a generation number
    b"5 true R (s) Tj",
    b"5 true Tj",
    # strings: escapes, octal, nesting, hex with whitespace
    b"(\\101\\102 \\(x\\)) Tj",
    b"<48 6\n5 6c6C 6f> Tj",
    # structure errors end extraction with pieces so far
    b"(a) Tj ] (b) Tj",
    b"(a) Tj endobj (b) Tj",
    b"(a) Tj >> (b) Tj",
    b"(a) Tj stream\n (b) Tj",
    # incomplete array contributes nothing
    b"[ (lost) 5",
    # operators inside arrays are elements, not clears
    b"(s) [ Tj (t) ] TJ",
]


def test_fast_interpreter_edge_cases_match_exact():
    for data in EDGE_CASES:
        fast, exact = _both(data)
        if fast is None:
            continue  # bailed: exact path used in production
        assert fast == exact, data


def test_fast_interpreter_fuzz_matches_exact():
    rng = random.Random(987123)
    ops = [b"Tj", b"TJ", b"'", b'"', b"BT", b"ET", b"Td", b"R", b"re",
           b"gs", b"Do", b"q", b"Q"]
    kws = [b"obj", b"endobj", b"stream", b"trailer", b"xref", b"true",
           b"false", b"null", b"startxref", b"endstream"]

    def tok(depth=0):
        r = rng.random()
        if r < 0.28:
            return str(rng.choice([0, 1, -5, 42])).encode()
        if r < 0.34:
            return b"%.2f" % rng.uniform(-9, 9)
        if r < 0.47:
            return b"(" + bytes(rng.choice(b"ab\\()n01")
                                for _ in range(rng.randint(0, 6))) + b")"
        if r < 0.54:
            return b"<" + bytes(rng.choice(b"0123456789abcdef \n")
                                for _ in range(rng.randint(0, 6))) + b">"
        if r < 0.61:
            return b"/" + bytes(rng.choice(b"AbC#4d")
                                for _ in range(rng.randint(1, 5)))
        if r < 0.79:
            return rng.choice(ops)
        if r < 0.84:
            return rng.choice(kws)
        if r < 0.93 and depth < 3:
            return (b"[ " + b" ".join(tok(depth + 1)
                                      for _ in range(rng.randint(0, 5)))
                    + b" ]")
        if r < 0.96:
            return b"<< /K " + tok(depth + 1) + b" >>"
        return rng.choice([b"{", b"}", b"]", b">>", b"\xff", b"%c\n"])

    mismatches = []
    for _ in range(3000):
        data = b" ".join(tok() for _ in range(rng.randint(1, 20)))
        fast, exact = _both(data)
        if fast is None:
            continue
        if fast != exact:
            mismatches.append((data, fast, exact))
    assert not mismatches, mismatches[:3]


def test_fallback_constructs_bail_not_diverge():
    for data in (b"<< /A 1 >> (x) Tj", b"1 0 obj (x) Tj endobj",
                 b"[ << /A 1 >> ] TJ"):
        with pytest.raises(TE._FallBack):
            TE._text_fast(data)
        # and the public entry point still yields the exact result
        assert (TE.text_from_content_bytes(data)
                == TE._text_exact(TE.excise_inline_images(data)))


# ---------------------------------------------------------------------------
# tier-1 regex interpreter (_text_fast2): must be byte-identical to the
# production chain on every stream it accepts and bail (either fallback
# exception) on the rest — the bail path re-runs a pinned tier, so only
# the non-bail path can diverge. 500k trials of the two generators below
# ran clean at change time (OPTIMIZATION_r06.md).
# ---------------------------------------------------------------------------

def _old_chain(data: bytes):
    try:
        return ("ok", TE._text_fast(data))
    except TE._FallBack:
        try:
            return ("ok", TE._text_exact(data))
        except Exception as exc:  # noqa: BLE001
            return ("exc", type(exc).__name__)
    except Exception as exc:  # noqa: BLE001
        return ("exc", type(exc).__name__)


def _fast2_outcome(data: bytes):
    try:
        return ("ok", TE._text_fast2(data))
    except (TE._FallBack2, TE._FallBack):
        return None  # bail: a pinned tier re-runs in production
    except Exception as exc:  # noqa: BLE001
        return ("exc", type(exc).__name__)


FAST2_EDGE_CASES = EDGE_CASES + [
    # sign/dot lead bytes must route to the number-error bail, never lex
    # as an operator word (the <nb> group)
    b"(a) Tj + (b) Tj",
    b"(a) Tj . (b) Tj",
    b"(a) Tj -. (b) Tj",
    b"(a) Tj 5.. (b) Tj",
    # prefix keyword matching with no word boundary
    b"(a) truex Tj",
    # comment filler mid-stream and (bail) at EOF
    b"(a) %c\n Tj",
    b"(a) Tj %trailing",
    # deep-nesting breach lands on the same element
    b"[" * 199 + b"(deep)" + b"]" * 199 + b" TJ",
    b"[" * 201 + b"(deep)" + b"]" * 201 + b" TJ",
    # hex with odd nibble + embedded whitespace; escape-free vs escaped
    b"<48 6\n5 6c6C 6> Tj",
    b"(no escapes) Tj (with \\(escapes\\)) Tj",
    # held-token paths through the int lookahead
    b"1 null (x) Tj",
    b"1 2 3 4 (x) Tj",
    b"(a) 5 true 7 Tj",
    # native dict consumption (tier 1 handles what tier 2 bails on, so
    # these pin fast2 against the EXACT path): dicts are transparent
    # operands, their string values never show, and parse()'s dict error
    # shapes end extraction at the same point
    b"(x) << /K (inner) >> Tj",
    b"<< /A 1 /B 2.5 /C /N /D true /F (s) /G <4142> /H [1 (e)] >> (a) Tj",
    b"<< /A << /B << /C 1 >> >> >> (a) Tj",
    b"[ (a) << /X (hidden) >> (b) ] TJ",
    b"<< /A 1 2 >> (a) Tj",          # int-pair value -> int key -> end
    b"<< /A 1 0 R /B 2 >> (a) Tj",   # Ref value
    b"<< (key) (val) >> (a) Tj",     # non-name key -> end
    b"<< /A >> (a) Tj",              # '>>' in value position -> end
    b"<< /A",                         # EOF after a key
    b"<< /A 5 true R >> (a) Tj",     # bool generation number
    b"1 2 << /K 3 >> (x) Tj",        # dict via the int-run hold
    b"[" * 199 + b"<< /K (v) >>" + b"]" * 199 + b" TJ",
    b"[" * 200 + b"<< /K (v) >>" + b"]" * 200 + b" TJ",
]


def test_fast2_edge_cases_match_production():
    for data in FAST2_EDGE_CASES:
        got = _fast2_outcome(data)
        if got is None:
            continue  # bailed: pinned tier used in production
        assert got == _old_chain(data), data


def test_fast2_fuzz_matches_production():
    rng = random.Random(31337)
    ops = [b"Tj", b"TJ", b"'", b'"', b"BT", b"ET", b"Td", b"R", b"re",
           b"gs", b"Do", b"q", b"Q", b"T#6a", b"truex"]
    kws = [b"obj", b"endobj", b"stream", b"trailer", b"xref", b"true",
           b"false", b"null", b"startxref", b"endstream", b"<<", b">>"]

    def tok(depth=0):
        r = rng.random()
        if r < 0.20:
            return str(rng.choice([0, 1, -5, 42])).encode()
        if r < 0.30:
            return rng.choice([b"3.14", b"5.", b".5", b"+", b"-", b".",
                               b"+.", b"..", b"5..", b"+5"])
        if r < 0.44:
            return b"(" + bytes(rng.choice(b"ab\\()n01 \t")
                                for _ in range(rng.randint(0, 8))) + b")"
        if r < 0.52:
            return (b"<" + bytes(rng.choice(b"0123456789abcdefXYZ \n")
                                 for _ in range(rng.randint(0, 6)))
                    + rng.choice([b">", b""]))
        if r < 0.60:
            return b"/" + bytes(rng.choice(b"AbC#4dz")
                                for _ in range(rng.randint(0, 6)))
        if r < 0.75:
            return rng.choice(ops)
        if r < 0.81:
            return rng.choice(kws)
        if r < 0.90 and depth < 4:
            return (b"[ " + b" ".join(tok(depth + 1)
                                      for _ in range(rng.randint(0, 5)))
                    + rng.choice([b" ]", b""]))
        if r < 0.94:
            return b"<< /K " + tok(depth + 1) + b" >>"
        return rng.choice([b"{", b"}", b"]", b">>", b"\xff", b"%c\n",
                           b"%c", b")", b"\x7f", b"stream\r\nX"])

    mismatches = []
    for _ in range(3000):
        data = rng.choice([b" ", b"", b"\n"]).join(
            tok() for _ in range(rng.randint(1, 22)))
        data += rng.choice([b"", b" ", b"\n\n", b"\t"])
        got = _fast2_outcome(data)
        if got is None:
            continue
        want = _old_chain(data)
        if got != want:
            mismatches.append((data, got, want))
    assert not mismatches, mismatches[:3]
