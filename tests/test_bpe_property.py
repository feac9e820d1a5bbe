"""Property test: the incremental in-memory BPE merge loop (pair-count
dict + inverted index + lazy-deletion heap, functions/bpe.bpe_merge_loop)
against a naive full-recount reference, on adversarial tiny-alphabet
vocabularies where merges collide on surface forms, pairs zero out and
reappear, and identical-symbol runs stress the greedy rewrite.

Pure Python on both sides — no Spark — so hypothesis can afford wide
exploration; the Spark-equivalence of the same loop is pinned separately
in test_bpe.py (collected == distributed canonical)."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stream2segment_spark.functions.bpe import bpe_merge_loop


def _rewrite(syms: list[str], left: str, right: str) -> list[str]:
    out, k = [], 0
    while k < len(syms):
        if k + 1 < len(syms) and syms[k] == left and syms[k + 1] == right:
            out.append(left + right)
            k += 2
        else:
            out.append(syms[k])
            k += 1
    return out


def naive_bpe(words, freqs, n_merges):
    """Full recount every round — the obviously-correct reference."""
    syms_list = [list(w) for w in words]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(syms_list, freqs):
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        syms_list = [_rewrite(s, left, right) for s in syms_list]
    return merges, syms_list


words_strategy = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=9),
    min_size=1, max_size=18)


@settings(max_examples=250, deadline=None)
@given(words=words_strategy,
       freq_seed=st.integers(0, 2**30),
       n_merges=st.integers(1, 14))
def test_merge_loop_matches_naive_recount(words, freq_seed, n_merges):
    freqs = [1 + (freq_seed >> (2 * i)) % 5 for i in range(len(words))]
    got_m, got_s = bpe_merge_loop(words, freqs, n_merges)
    want_m, want_s = naive_bpe(words, freqs, n_merges)
    assert got_m == want_m
    assert got_s == want_s
    # every segmentation still concatenates back to its word
    for w, s in zip(words, got_s):
        assert "".join(s) == w


@settings(max_examples=60, deadline=None)
@given(words=st.lists(st.text(alphabet="abc", min_size=1, max_size=7),
                      min_size=1, max_size=10),
       n_merges=st.integers(1, 30))
def test_merge_loop_exhaustion_and_positive_counts(words, n_merges):
    """Every recorded count is positive; a shorter-than-requested merge
    list can only mean TOTAL exhaustion — any remaining adjacent pair
    would have count >= 1, so early stop implies every word is down to
    a single symbol. The prefix property pins determinism: training k
    merges yields exactly the first k of a longer run."""
    merges, syms_list = bpe_merge_loop(words, [1] * len(words), n_merges)
    assert all(c > 0 for _, _, c in merges)
    assert len(merges) <= n_merges
    if len(merges) < n_merges:
        assert all(len(s) == 1 for s in syms_list)
    if merges:
        k = (len(merges) + 1) // 2
        prefix, _ = bpe_merge_loop(words, [1] * len(words), k)
        assert prefix == merges[:k]
