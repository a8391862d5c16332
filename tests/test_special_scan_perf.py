"""Special-token scan overhead on a large-special-vocab config.

The reference advertises "Simplified BPE ... to reduce performance impact of
large special token vocabulary" (/root/reference/README.md:20); its scanner
is one cached str.find per special token
(/root/reference/src/tiktoken/tiktoken.cpp:130-154), i.e. 1,134 finds per
segment region on the Llama-4 config. Our host scanner replaces that with a
single-pass sweep over distinct leading bigrams (hostengine.py), so
encode(allowed_special="all") on special-free text must stay within ~1.2x
of encode_ordinary (measured 1.16x on this machine; asserted at 1.5x to
absorb CI noise).
"""

import time

import pytest


@pytest.mark.slow
def test_allowed_all_overhead_small(llama4_assets):
    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    enc = td.Encoding(
        "llama4", pat_str=pattern, mergeable_ranks=ranks,
        special_tokens=specials,
    )
    # big enough that the µs-scale constant costs (scan setup, plan
    # build) are amortized — at ~22 KB this assert was load-flaky under
    # the full suite (ratio is a timing quotient of ~70 µs quantities)
    text = ("lorem ipsum dolor sit amet, consectetur adipiscing elit " * 2000)

    def best(fn, reps=11):
        fn()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_ord = best(lambda: enc.encode_ordinary(text))
    t_all = best(lambda: enc.encode(text, allowed_special="all"))
    ratio = t_all / t_ord
    assert ratio < 1.5, f"allowed_special='all' overhead {ratio:.2f}x"
