"""Totality soak: bit-flip / truncate / splice mutations of real corpus
PDFs through the FULL kernel (extract_document, both text modes) —
every mutation must quarantine or succeed, never raise."""
import random
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pdf4py_spark.kernel.extract import extract_document
from pdf4py_spark.sources.corpus import corpus_rows, password_for

docs = [(u, p, password_for(u)) for u, _t, p, _x, _l in corpus_rows()
        if p.startswith(b"%PDF-") and len(p) < 300_000]
rng = random.Random(int(sys.argv[2]) if len(sys.argv) > 2 else 20260817)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
t0 = time.time()
fail = 0
for i in range(N):
    url, payload, pw = docs[rng.randrange(len(docs))]
    data = bytearray(payload)
    kind = rng.randrange(4)
    if kind == 0:  # bit flips
        for _ in range(rng.randrange(1, 8)):
            pos = rng.randrange(len(data))
            data[pos] ^= 1 << rng.randrange(8)
    elif kind == 1:  # truncate
        data = data[:rng.randrange(1, len(data))]
    elif kind == 2:  # splice a window from another doc
        other = docs[rng.randrange(len(docs))][1]
        a = rng.randrange(len(data))
        w = rng.randrange(1, 512)
        b = rng.randrange(max(1, len(other) - w))
        data[a:a + w] = other[b:b + w]
    else:  # byte-run overwrite
        a = rng.randrange(len(data))
        w = rng.randrange(1, 256)
        data[a:a + w] = bytes([rng.randrange(256)]) * w
    for mode in ("raw", "unicode"):
        try:
            res = extract_document(bytes(data), pw, text_mode=mode)
        except Exception as exc:  # noqa: BLE001
            fail += 1
            print("RAISED", i, url, kind, mode, type(exc).__name__, exc)
            with open("/tmp/soak_crash_%d.bin" % i, "wb") as fh:
                fh.write(bytes(data))
            if fail >= 5:
                sys.exit(1)
print("soak done: %d mutations x2 modes in %.1fs, %d failures"
      % (N, time.time() - t0, fail))
sys.exit(1 if fail else 0)
