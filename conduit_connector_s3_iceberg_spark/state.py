"""Generation-manifest state machinery shared by every persisted index.

Three state roots follow the same discipline — the dedup labels table
(``operators/dedup.py``), the cell-partitioned ANN index
(``operators/similarity.py``), and the maintenance-demo staging corpus —
and this module owns the invariants they share, so the next persisted
index gets all of them for free:

* **Atomic manifest commit.** Every mutation stages its files into
  generation-scoped directories that no reader lists until the manifest
  names them, then replaces ``manifest.json`` via ``os.replace`` —
  readers see old-or-new, never a torn file or a half-applied write.
  (The parquet analogue of Iceberg's manifest-list commit,
  ``SparkUtils.java:45-51`` being the reference's Iceberg bootstrap.)
* **Snapshot-keyed freshness.** ``corpus_snapshot`` records per-file
  (size, mtime_ns); ``snapshot_delta`` classifies a corpus change as
  unchanged / pure-append / rewrite, which is what lets maintenance run
  O(delta) on appends and rebuild only on rewrites.
* **Coherence checking.** When a state root and a separate staging area
  must agree (the maintenance demo), the manifest carries a phase stamp
  (``stamp_manifest``) and readers verify it before serving — deleting
  one root but not the other restages instead of silently serving a
  wrong diff.
* **Generation expiry.** ``expire_generations`` deletes generation
  directories the manifest no longer reaches (gens below ``base_gen``
  after compaction, orphans from crashed writers above ``gen``), so
  compaction actually reclaims space instead of leaving every historical
  generation on disk forever.
"""

from __future__ import annotations

import json
import os
import shutil


def corpus_snapshot(src: str) -> dict:
    """Per-file (size, mtime_ns) of the corpus — the append detector.
    A file is 'unchanged' iff both match; _-prefixed markers (_SUCCESS)
    and dotfiles are transport noise, not data."""
    if os.path.isfile(src):
        st = os.stat(src)
        return {os.path.basename(src): [st.st_size, st.st_mtime_ns]}
    out: dict = {}
    for dirpath, _, files in os.walk(src):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, src)] = [st.st_size, st.st_mtime_ns]
    return out


def snapshot_delta(old: dict, cur: dict) -> tuple[str, list[str]]:
    """Classify a corpus change: ``("unchanged", [])`` when every file
    matches exactly; ``("appended", new_files)`` when every OLD file is
    byte-identical (size+mtime) and at least one new file exists —
    the O(delta) maintenance precondition; ``("rewritten", [])`` for
    anything else (modified or deleted files → full rebuild)."""
    if old == cur:
        return "unchanged", []
    if old and set(old) <= set(cur) and all(old[k] == cur[k] for k in old):
        return "appended", sorted(k for k in cur if k not in old)
    return "rewritten", []


def read_manifest(root: str) -> dict | None:
    p = os.path.join(root, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def write_manifest(root: str, manifest: dict) -> None:
    """Manifest write is the commit point: written LAST (after every data
    file of the new generation) and atomically via rename, so a crashed
    writer never publishes partial state and a concurrent reader sees
    old-or-new, never a torn file."""
    tmp = os.path.join(root, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(root, "manifest.json"))


def stamp_manifest(root: str, **extra) -> dict:
    """Read-modify-write extra keys into an existing manifest (atomic).
    Used for cross-root coherence stamps (e.g. the maintenance demo's
    ``stage_phase``) that the generic build/maintain writers don't know
    about. Raises if no manifest exists — a stamp on nothing is a bug."""
    man = read_manifest(root)
    if man is None:
        raise ValueError(f"no manifest at {root} to stamp")
    man.update(extra)
    write_manifest(root, man)
    return man


def gen_dir(root: str, kind: str, gen: int) -> str:
    """Generation-scoped data directory: ``<root>/<kind>/gen_<g>``."""
    return os.path.join(root, kind, f"gen_{gen}")


def gen_paths(root: str, kind: str, gen: int, base: int = 0) -> list[str]:
    """Reader path list for an appended artifact: generations
    ``base..gen`` inclusive — a generation exists only once the manifest
    names it, so files written by a crashed half-applied maintenance are
    invisible until its manifest commit; the retry overwrites them."""
    return [gen_dir(root, kind, g) for g in range(base, gen + 1)]


def _live_gens(d: str) -> list[tuple[int, str]]:
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("gen_"):
            try:
                out.append((int(name[4:]), os.path.join(d, name)))
            except ValueError:
                continue
    return out


def expire_generations(root: str, keep: dict[str, set[int]]) -> list[str]:
    """Delete generation directories not named in ``keep`` (a map of
    artifact kind → the generation numbers still reachable from the
    manifest). Returns the deleted paths. The caller computes ``keep``
    from the COMMITTED manifest, so expiry can never race a writer into
    deleting a generation a reader could still list: anything outside
    the keep set is either below ``base_gen`` (compacted away) or an
    orphan from a crashed writer whose retry overwrites it anyway."""
    deleted = []
    for kind, gens in keep.items():
        for g, path in _live_gens(os.path.join(root, kind)):
            if g not in gens:
                shutil.rmtree(path, ignore_errors=True)
                deleted.append(path)
    return deleted
