"""S13: KB dump download with skip-if-exists resume
(``kb/.../conversion/SelectRelations.java:106-127`` downloadDBpedia).

The reference streams each configured dump URL into ``kbDir`` under the
URL's last path segment, skipping files that already exist (its resume
contract: re-running the KB build never re-downloads). This rebuild
keeps those semantics and adds an atomic-rename so a crashed transfer
can never masquerade as a completed file (the reference's plain
FileOutputStream can leave a truncated file that the skip-if-exists
check then trusts forever).

The HTTP transport is an injected callable — the same honest-seam
pattern as the multimodal decode stubs: this sandbox has no network, so
tests inject a deterministic fake and the default ``urllib`` transport
is exercised only in deployment. Downstream consumption needs no
special handling: Spark's text source reads ``.bz2`` dumps directly
(Hadoop codec), so ``sources.io.read_ntriples`` takes the downloaded
paths as-is.
"""

from __future__ import annotations

import pathlib
from collections.abc import Callable, Iterable


def _default_fetch(url: str) -> bytes:  # pragma: no cover — no network in CI
    import urllib.request

    with urllib.request.urlopen(url) as r:
        return r.read()


def url_filename(url: str) -> str:
    """Last path segment — the reference's
    ``urlLine.substring(urlLine.lastIndexOf('/')+1)``."""
    return url.rsplit("/", 1)[-1]


def download_kb_files(
    urls: Iterable[str],
    kb_dir: str | pathlib.Path,
    fetch: Callable[[str], bytes] | None = None,
) -> list[dict]:
    """Download each URL into ``kb_dir`` unless its target file already
    exists (skip-if-exists resume). Sequential by design — the reference
    deliberately does not parallelize against the dump host
    (SelectRelations.java:111 "not kind to dbpedia's hosting").

    Writes are atomic: bytes land in ``.<name>.part`` and rename into
    place only when complete, so an interrupted run leaves no file the
    resume check would wrongly skip.

    Returns one record per URL: {url, filename, action, n_bytes} with
    action in {"downloaded", "skipped"}.
    """
    kb = pathlib.Path(kb_dir)
    kb.mkdir(parents=True, exist_ok=True)
    if fetch is None:
        fetch = _default_fetch
    out = []
    for url in urls:
        name = url_filename(url)
        if not name:
            raise ValueError(f"URL has no file segment: {url!r}")
        target = kb / name
        if target.exists():
            out.append(
                {"url": url, "filename": name, "action": "skipped",
                 "n_bytes": target.stat().st_size}
            )
            continue
        data = fetch(url)
        part = kb / f".{name}.part"
        part.write_bytes(data)
        part.rename(target)  # atomic commit: complete files only
        out.append(
            {"url": url, "filename": name, "action": "downloaded",
             "n_bytes": len(data)}
        )
    return out
