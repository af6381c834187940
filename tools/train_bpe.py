"""Train the vendored character-level BPE merge table.

Sennrich/Haddow/Birch BPE training (ACL 2016, public algorithm): start
from characters, repeatedly merge the most frequent adjacent symbol
pair across the pre-token vocabulary. Pre-tokenization uses the same
RE2-safe BPE_PATTERN as the gated queries, so training and encoding
segment text identically.

Determinism: ties on pair frequency break lexicographically, so the
emitted fixture is reproducible from the corpus.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
Writes pdf4py_spark/operators/bpe_merges.py.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf4py_spark.operators.textstats import BPE_PATTERN  # noqa: E402


def train(texts, n_merges):
    vocab = collections.Counter()
    pat = re.compile(BPE_PATTERN)
    for text in texts:
        for tok in pat.findall(text):
            vocab[tuple(tok)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = collections.Counter()
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import duckdb
    texts = [r[0] for r in duckdb.sql(
        "SELECT text FROM read_parquet('%s')"
        % os.path.join(sf_dir, "documents.parquet")).fetchall()]
    merges = train(texts, n_merges)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pdf4py_spark", "operators",
        "bpe_merges.py")
    with open(out, "w") as fh:
        fh.write('"""Vendored BPE merge table: trained by '
                 "tools/train_bpe.py on the\nsynthetic sf0.001 documents "
                 "corpus (%d merges, character-level,\nBPE_PATTERN "
                 "pre-tokenizer). Regenerate with the tool; do not edit."
                 '"""\n\n' % len(merges))
        fh.write("BPE_MERGES = [\n")
        for a, b in merges:
            fh.write("    (%r, %r),\n" % (a, b))
        fh.write("]\n")
    print("wrote %d merges to %s" % (len(merges), out))


if __name__ == "__main__":
    main()
