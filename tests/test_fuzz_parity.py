"""Randomized differential fuzzing: random mode/param combinations,
byte parity vs the reference binary for both engines.

Marked slow; run explicitly with ``-m slow`` (the default suite already
covers each mode deterministically).
"""

from __future__ import annotations

import random

import pytest

import datagen
from test_parity import assert_parity, run_ours, run_reference


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(20))
def test_fuzz_parity(tmp_path, ref_binary, seed):
    rng = random.Random(seed * 7919)
    tmp = str(tmp_path)
    mode = dict(
        simulated=rng.random() < 0.5,
        symmetric=rng.random() < 0.4,
        gz=rng.random() < 0.25,
        fastq=rng.random() < 0.2,
        multiline=rng.random() < 0.3,
        n_reads=rng.randint(5, 80),
        len_lo=rng.randint(1, 2000),
        len_hi=rng.randint(3000, 80000),
        n_pairs=rng.randint(0, 400),
        with_repeats=rng.random() < 0.8,
    )
    if mode["fastq"]:
        mode["multiline"] = False
    reads, paf = datagen.standard_case(seed=seed, tmpdir=tmp, **mode)

    reso = rng.choice([1, 7, 50, 100, 333])
    p = rng.choice([500, 1000, 2000, 5000])
    l_mult = rng.randint(1, 5)
    args = ["-e", str(rng.randint(1, 40)),
            "-m", str(rng.choice([0.5, 1.0, 1.3, 1.5, 2.5])),
            "-r", str(reso),
            "-p", str(p),
            "-l", str(p * l_mult + rng.randint(0, p - 1)),
            "-f", str(rng.choice([0, 17, 300, 5000])),
            # -v must stay <= -p: the reference crashes outright on
            # overlap > interval (substr underflow, chop.hpp:318; we
            # reject it in validation — PARITY.md divergence 7), so the
            # differential domain is overlap <= interval
            "-v", str(rng.choice([v for v in (0, 3, 200, 1000)
                                  if v <= p]))]
    ref_prefix = f"{tmp}/ref"
    our_prefix = f"{tmp}/ours"
    run_reference(ref_binary, args + ["-o", ref_prefix, reads, paf], tmp)
    engine = "jax" if seed % 2 == 0 else "oracle"
    run_ours(args + ["-o", our_prefix, reads, paf], engine=engine,
             io="native" if seed % 3 else "python")
    assert_parity(tmp, ref_prefix, our_prefix)
