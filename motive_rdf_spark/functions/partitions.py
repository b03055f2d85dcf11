"""Set-partition sampling + Bell numbers (reference
Utils.partition/randExp/bell, Utils.java:228-331) — kept for test
parity with UtilsTest.partitionTest (UtilsTest.java:56-82): the
sampler must hit all Bell(n) partitions of a set, uniformly.

Driver-side pure Python (the reference uses these only in sampling
code and tests; never on data-plane rows).
"""

from __future__ import annotations

import random
from functools import lru_cache


@lru_cache(maxsize=None)
def bell(n: int) -> int:
    """Bell number B(n) via the Bell triangle (Utils.bell,
    Utils.java:302-331)."""
    if n == 0:
        return 1
    row = [1]
    for _ in range(n - 1):
        new = [row[-1]]
        for x in row:
            new.append(new[-1] + x)
        row = new
    return row[-1]


def random_partition(items: list, rng: random.Random) -> list[list]:
    """Uniform random set partition via the Chinese-restaurant-style
    sequential construction weighted to be exactly uniform over all
    B(n) partitions (Utils.partition semantics, Utils.java:228-271):
    item i joins an existing block or opens a new one with probability
    proportional to the number of completions."""
    n = len(items)
    blocks: list[list] = []
    placed = 0
    for it in items:
        remaining = n - placed - 1
        # weight of joining any existing block: B(remaining + k - 1)
        # ... uniformity follows from counting completions with k blocks
        k = len(blocks)
        w_existing = bell_completions(remaining, k)
        w_new = bell_completions(remaining, k + 1)
        weights = [w_existing] * k + [w_new]
        total = sum(weights)
        x = rng.random() * total
        acc = 0.0
        chosen = len(weights) - 1
        for i, w in enumerate(weights):
            acc += w
            if x < acc:
                chosen = i
                break
        if chosen == k:
            blocks.append([it])
        else:
            blocks[chosen].append(it)
        placed += 1
    return blocks


@lru_cache(maxsize=None)
def bell_completions(remaining: int, k: int) -> int:
    """Number of ways to partition ``remaining`` further items given
    ``k`` existing blocks (generalized Bell B_k(n)): each further item
    joins one of the open blocks or opens a new one."""
    if remaining == 0:
        return 1
    # recurrence: first remaining item joins one of k blocks or opens one
    return k * bell_completions(remaining - 1, k) + bell_completions(remaining - 1, k + 1)


def rand_exp(lam: float, rng: random.Random) -> float:
    """Exponential sample (Utils.randExp, Utils.java:278-297)."""
    import math

    return -math.log(1.0 - rng.random()) / lam
