"""OPIC-style frontier priority — ONE numpy implementation shared by the
pure-Python oracle and the Spark job (via pandas UDF), so the float is
bit-identical on both sides and the crawl ordering can be compared
exactly (SURVEY.md §7 "hard parts": ordering equality needs a total
order shared to the last ulp).

priority = 1/(1+depth) + 0.1*log1p(link_count)

Shape follows the reference's NodePopularity score-spreading
(``kb/.../NodePopularity.java:33-58``: score decays with distance,
grows with in-links). Total order used everywhere:
(priority DESC, pseudoRandomFromString(url) ASC, url ASC).
"""

from __future__ import annotations

import numpy as np


def priority_score(depth, link_count) -> np.ndarray:
    depth = np.asarray(depth, dtype=np.float64)
    link_count = np.asarray(link_count, dtype=np.float64)
    return 1.0 / (1.0 + depth) + 0.1 * np.log1p(link_count)
