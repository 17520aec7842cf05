"""Deterministic synthetic crawl fixtures (seed=42, per FIXTURES.md).

Synthesizes the `input_hint` world locally — NO external data:

* ``documents_spans`` — interleaved text+media docs
  ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``;
  doc_id is the page URL (reference: doc id = WARC-Target-URI,
  ``corpus/.../crawl/SaveCommonCrawlBase.java:142-148``); spans are
  offset-sorted (``nlp/.../Document.java:343-376``); ``link`` spans'
  media_ref values form a reproducible link graph that feeds the frontier.
* ``seeds`` — raw URLs with canonical-duplicate noise.
* ``robots_rules`` — per-host allow/deny prefixes + crawl delay.

Host distribution is Zipf-ish over ~50 hosts with 3 hot hosts holding a
large share of URLs, to exercise hot-host skew splitting.

Everything is derived from ``random.Random(42)``; generating twice gives
byte-identical tables. Parquet output is cached under a given directory.
"""

from __future__ import annotations

import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

N_HOSTS = 50
HOT_HOSTS = ["hot0.example.com", "hot1.example.com", "hot2.example.com"]
KINDS_TEXTY = ["text", "paragraph", "section_header"]
WORDS = (
    "the data spark crawl frontier host link page fetch queue index text media "
    "image title robot delay budget span offset batch round seed graph url"
).split()

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

SPANS_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(SPAN_STRUCT))]
)


def _hosts(rng: random.Random) -> list[str]:
    hosts = list(HOT_HOSTS)
    hosts += [f"host{i}.example.com" for i in range(N_HOSTS - len(HOT_HOSTS))]
    return hosts


def _host_weights(hosts: list[str]) -> list[float]:
    # hot hosts ~30% of mass; rest Zipf(1.2)
    w = []
    for i, h in enumerate(hosts):
        if h in HOT_HOSTS:
            w.append(10.0)
        else:
            w.append(1.0 / ((i + 1) ** 1.2))
    return w


def _mk_url(rng: random.Random, hosts: list[str], weights: list[float]) -> str:
    host = rng.choices(hosts, weights)[0]
    depth = rng.randint(1, 3)
    path = "/" + "/".join(rng.choice(["a", "b", "page", "item", "doc"]) + str(rng.randint(0, 99)) for _ in range(depth))
    q = f"?q={rng.randint(0, 9)}" if rng.random() < 0.2 else ""
    return f"http://{host}{path}{q}"


def _uglify(rng: random.Random, url: str) -> str:
    """Render a canonical URL in a non-canonical but equivalent form."""
    u = url
    r = rng.random()
    if r < 0.25:
        u = u.replace("http://", "HTTP://", 1)
    elif r < 0.5:
        scheme, rest = u.split("://", 1)
        host, _, tail = rest.partition("/")
        u = f"{scheme}://{host.upper()}:80/{tail}"
    elif r < 0.7:
        u = u + "#frag" + str(rng.randint(0, 9))
    elif r < 0.85 and "?" not in u:
        u = u + "/"
    else:
        u = "  " + u + " "
    return u


def generate(n_docs: int = 2000, seed: int = 42):
    """Return (documents rows, seeds rows, robots rows) as python lists."""
    rng = random.Random(seed)
    hosts = _hosts(rng)
    weights = _host_weights(hosts)

    # universe of page URLs (canonical form by construction)
    urls = []
    seen = set()
    while len(urls) < n_docs:
        u = _mk_url(rng, hosts, weights)
        if u not in seen:
            seen.add(u)
            urls.append(u)

    docs = []
    for u in urls:
        n_spans = rng.randint(3, 30)
        spans = []
        offset = 0
        spans.append({"kind": "title", "text": " ".join(rng.choices(WORDS, k=3)), "media_ref": None, "offset": 0})
        offset += len(spans[0]["text"]) + 2
        n_links = rng.randint(0, 10)
        link_slots = set(rng.sample(range(1, n_spans), min(n_links, n_spans - 1))) if n_spans > 1 else set()
        for i in range(1, n_spans):
            if i in link_slots:
                if rng.random() < 0.8:
                    target = rng.choice(urls[: max(1, len(urls) - 1)]) if len(urls) > 1 else u
                else:
                    target = _mk_url(rng, hosts, weights) + "x" + str(rng.randint(0, 999))
                txt = " ".join(rng.choices(WORDS, k=2))
                spans.append({"kind": "link", "text": txt, "media_ref": target, "offset": offset})
            elif rng.random() < 0.1:
                ref = f"http://{rng.choice(hosts)}/media/img{rng.randint(0, 999)}.jpg"
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})
            else:
                txt = " ".join(rng.choices(WORDS, k=rng.randint(3, 12)))
                spans.append({"kind": rng.choice(KINDS_TEXTY), "text": txt, "media_ref": None, "offset": offset})
            offset += len(spans[-1]["text"]) + 1
        docs.append({"doc_id": u, "spans": spans})

    # seeds: sample of doc urls + some unknown urls, with ugly duplicates
    seed_rows = []
    n_seed = min(400, max(20, n_docs // 5))
    base = rng.sample(urls, n_seed)
    base += [_mk_url(rng, hosts, weights) + "nowhere" + str(i) for i in range(max(10, n_seed // 7))]
    for u in base:
        seed_rows.append({"url": _uglify(rng, u) if rng.random() < 0.5 else u, "depth": 0})
    # explicit canonical duplicates (>=10%)
    for u in rng.sample(base, max(5, n_seed // 7)):
        seed_rows.append({"url": _uglify(rng, u), "depth": 0})
    rng.shuffle(seed_rows)

    robots = []
    for h in hosts:
        if h == "host44.example.com":
            robots.append({"host": h, "allow_prefixes": [], "deny_prefixes": ["/"], "crawl_delay_s": 1.0})
        elif h == "host45.example.com":
            robots.append({"host": h, "allow_prefixes": [], "deny_prefixes": [], "crawl_delay_s": 1000.0})
        elif h in HOT_HOSTS:
            robots.append({"host": h, "allow_prefixes": [], "deny_prefixes": ["/b"], "crawl_delay_s": 0.5})
        else:
            robots.append({"host": h, "allow_prefixes": [], "deny_prefixes": [], "crawl_delay_s": 1.0})
    return docs, seed_rows, robots


def write_fixtures(out_dir: str | pathlib.Path, n_docs: int = 2000, seed: int = 42) -> pathlib.Path:
    """Write documents_spans/seeds/robots_rules parquet; idempotent cache."""
    out = pathlib.Path(out_dir)
    marker = out / f".done-{n_docs}-{seed}"
    if marker.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    docs, seeds, robots = generate(n_docs=n_docs, seed=seed)

    doc_tbl = pa.Table.from_pylist(docs, schema=SPANS_SCHEMA)
    pq.write_table(doc_tbl, out / "documents_spans.parquet")

    seed_tbl = pa.Table.from_pylist(
        seeds, schema=pa.schema([pa.field("url", pa.string()), pa.field("depth", pa.int32())])
    )
    pq.write_table(seed_tbl, out / "seeds.parquet")

    robots_tbl = pa.Table.from_pylist(
        robots,
        schema=pa.schema(
            [
                pa.field("host", pa.string()),
                pa.field("allow_prefixes", pa.list_(pa.string())),
                pa.field("deny_prefixes", pa.list_(pa.string())),
                pa.field("crawl_delay_s", pa.float64()),
            ]
        ),
    )
    pq.write_table(robots_tbl, out / "robots_rules.parquet")
    marker.touch()
    return out


DEFAULT_FIXTURE_DIR = pathlib.Path("/root/repo/.fixtures")


def ensure_default(n_docs: int = 2000) -> pathlib.Path:
    return write_fixtures(DEFAULT_FIXTURE_DIR / f"n{n_docs}", n_docs=n_docs)
