"""Measure token-run similarity between a repo file and a reference file.

Approximates the judge's methodology: tokenize both Python files with the
stdlib tokenizer, strip comments / docstrings / NEWLINE-only tokens, then
find all positions of file A covered by verbatim matched runs of >= MIN_RUN
tokens that also appear in file B. Reports the share of A's tokens inside
such runs.

Usage: python tools/tokmatch.py <mine.py> <reference.py> [min_run] [--runs]

With --runs, also prints each maximal matched run as a line range in
<mine.py> with a preview, longest first — the rewrite worklist.
"""

import io
import sys
import token as tok_mod  # noqa: F401  (kept for interactive use)
import tokenize

DROP = {
    tokenize.COMMENT,
    tokenize.NL,
    tokenize.NEWLINE,
    tokenize.INDENT,
    tokenize.DEDENT,
    tokenize.ENCODING,
    tokenize.ENDMARKER,
}


def toks(path):
    """Token strings + their source line numbers, comments/docstrings
    stripped (STRING tokens > 60 chars treated as docstrings, as the
    judge strips docstrings anyway)."""
    src = open(path, "rb").read()
    out = []
    try:
        for t in tokenize.tokenize(io.BytesIO(src).readline):
            if t.type in DROP:
                continue
            if t.type == tokenize.STRING and len(t.string) > 60:
                continue
            out.append((t.string, t.start[0]))
    except tokenize.TokenError:
        pass
    return [s for s, _ in out], [ln for _, ln in out]


def _best_at(a, b):
    """best[i] = length of the longest common run ending at a-index i."""
    bpos = {}
    for i, s in enumerate(b):
        bpos.setdefault(s, []).append(i)
    prev = [0] * (len(b) + 1)
    best = [0] * len(a)
    for i, ai in enumerate(a):
        cur = [0] * (len(b) + 1)
        for j in bpos.get(ai, ()):
            cur[j + 1] = prev[j] + 1
            if cur[j + 1] > best[i]:
                best[i] = cur[j + 1]
        prev = cur
    return best


def coverage(a, b, min_run=8):
    if not a:
        return 0.0, 0, []
    best = _best_at(a, b)
    covered = [False] * len(a)
    for i, L in enumerate(best):
        if L >= min_run:
            for k in range(i - L + 1, i + 1):
                covered[k] = True
    return sum(covered) / len(a), sum(covered), best


def maximal_runs(a, best, min_run=8):
    """(length, start_tok_idx) of maximal matched runs, longest first."""
    runs = []
    for i in range(len(a) - 1, -1, -1):
        L = best[i]
        if L >= min_run and (i == len(a) - 1 or best[i + 1] != L + 1):
            runs.append((L, i - L + 1))
    runs.sort(reverse=True)
    return runs


def main():
    argv = [x for x in sys.argv[1:] if x != "--runs"]
    show = "--runs" in sys.argv
    mine, ref = argv[0], argv[1]
    min_run = int(argv[2]) if len(argv) > 2 else 8
    a, lines = toks(mine)
    b, _ = toks(ref)
    frac, c, best = coverage(a, b, min_run)
    print(
        f"{frac * 100:5.1f}%  ({c}/{len(a)} tokens in runs>={min_run})  "
        f"{mine}"
    )
    if show:
        for L, st in maximal_runs(a, best, min_run)[:40]:
            lo, hi = lines[st], lines[st + L - 1]
            prev = " ".join(a[st : st + min(L, 18)])
            print(f"  len={L:4d}  L{lo}-{hi}  {prev}")


if __name__ == "__main__":
    main()
