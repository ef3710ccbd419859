"""Random distributions + data scramblers (reference layer L0: src/random/).

Behavioral spec: /root/reference/src/random/ — uniform, normal (Box-Muller),
exponential, gamma, Nakagami-m, Rice-K, Weibull samplers with matching
pdf/cdf, plus the static-mask data scrambler (scramble.rs:7-37).

Design deviation (SURVEY.md §4 determinism caveat): the reference uses an
UNSEEDED thread_rng; here every sampler takes an explicit jax.random key, so
results are reproducible and sharding-safe.
"""

from .distributions import (  # noqa: F401
    randf,
    randf_pdf,
    randf_cdf,
    randuf,
    randuf_pdf,
    randuf_cdf,
    randnf,
    crandnf,
    awgn,
    cawgn,
    randnf_pdf,
    randnf_cdf,
    randexpf,
    randexpf_pdf,
    randexpf_cdf,
    randgammaf,
    randgammaf_pdf,
    randgammaf_cdf,
    randnakmf,
    randnakmf_pdf,
    randnakmf_cdf,
    randricekf,
    randricekf_pdf,
    randricekf_cdf,
    randweibf,
    randweibf_pdf,
    randweibf_cdf,
)
from .scramble import scramble_data, unscramble_data, unscramble_data_soft  # noqa: F401
