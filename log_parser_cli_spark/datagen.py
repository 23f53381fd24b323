"""Deterministic synthetic token-corpus generator (FIXTURES.md F1–F5).

Generates, at a parameterized scale with seed=42, the graft's input contract
(BASELINE.json input_hint): a table of pre-tokenized log sequences
``(doc_id, tokens:array<int32>, n_tok, source)`` plus the vocab that renders
them, the ground-truth template assignments, the generator-side template
dimension (⟪⟫ placeholder templates + compiled regexes, mirroring the
reference's LogTemplateDefinition, src/types/template.ts:12-23), the source
config dim (head patterns, src/types/head-pattern.ts:12-16), and an eval
labels fixture.

Everything is synthesized from scratch — log shapes are generic
(timestamp/level/pid heads, infra-flavored messages); no external data.

Determinism: a single np.random.default_rng(seed) drives all choices; vocab
ids are assigned in first-occurrence order of a deterministic generation
sequence, so the same (seed, n_rows) always produces byte-identical tables.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from log_parser_cli_spark.functions.templates import anchor_pattern, build_regex_from_template

SEED = 42

# Scale-factor → sequence count (in-sandbox proxy scales; the design scale is
# 10^12 — partitioning below is keyed so the same code paths exercise at both).
SF_ROWS = {"sf0.001": 3_000, "sf0.01": 30_000, "sf0.1": 300_000}

# ---------------------------------------------------------------------------
# Corpus spec. Var slot syntax in template strings: {int} {ip} {hex} {path}
# {word} {kv:key} — {word} values are alphabetic (NOT maskable), exercising
# Drain-tree merging; everything else is shape-maskable.
# ---------------------------------------------------------------------------


@dataclass
class SourceSpec:
    name: str
    weight: float
    head_kind: str  # which head renderer
    head_pattern: str  # JVM+PCRE-compatible regex, content group = content_group
    content_group: int
    vendor: str
    sink: str
    templates: list[str]
    template_weights: list[float] | None = None


SOURCES: list[SourceSpec] = [
    SourceSpec(
        name="apache",
        weight=0.55,
        head_kind="ts_level_pid",
        head_pattern=r"^(\S+) ([A-Z]+) pid=(\d+) (.*)$",
        content_group=4,
        vendor="httpd",
        sink="sink-apache",
        templates=[
            "workers {int} configured successfully",
            "jk2_init found child {int} in scoreboard slot {int}",
            "mod_jk child workerenv in error state {int}",
            "client {ip} denied by server configuration {path}",
            "directory index forbidden by rule for {path}",
            "caught sigterm shutting down",
            "session {hex} opened for user {word} on node {int}",
            "request to {path} completed in {int} ms with status {int}",
            "cache miss for key {hex} backend {ip} latency {int} ms",
            "worker pool resized from {int} to {int} threads",
            "ssl handshake with {ip} failed after {int} retries",
            "config reload triggered by signal {int} at generation {int}",
        ],
        template_weights=[0.22, 0.16, 0.12, 0.11, 0.09, 0.07, 0.06, 0.05, 0.04, 0.03, 0.03, 0.02],
    ),
    SourceSpec(
        name="hdfs",
        weight=0.18,
        head_kind="date_time_level",
        head_pattern=r"^(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}) ([A-Z]+) (.*)$",
        content_group=4,
        vendor="hadoop",
        sink="sink-hdfs",
        templates=[
            "receiving block blk_{int} src {ip} dest {ip}",
            "packetresponder {int} for block blk_{int} terminating",
            "block blk_{int} served to {ip}",
            "verification succeeded for blk_{int}",
            "deleting block blk_{int} file {path}",
            "namesystem allocate blk_{int} for {path} replicas {int}",
            "replica monitor scanned {int} blocks on volume {word} in {int} ms",
            "datanode registered with namenode {ip} storage {hex}",
            "exception in receiveblock for block blk_{int} java io ioexception connection reset",
            "slow blockreceiver write {kv:cost} ms to mirror {ip}",
        ],
        template_weights=[0.25, 0.2, 0.15, 0.1, 0.08, 0.07, 0.05, 0.04, 0.03, 0.03],
    ),
    SourceSpec(
        name="android",
        weight=0.10,
        head_kind="time_pid_tid_level",
        head_pattern=r"^(\d{2}:\d{2}:\d{2}\.\d{3}) (\d+) (\d+) ([VDIWE]) (.*)$",
        content_group=5,
        vendor="google",
        sink="sink-android",
        templates=[
            "power acquire wakelock {word} flags {hex}",
            "activitymanager start proc {int} for service {path}",
            "audio flinger buffer underrun on stream {int}",
            "sensor batching enabled rate {int} hz latency {int} us",
            "wifi state changed to connected rssi {int} bssid {hex}",
            "binder transaction failed code {int} to pid {int}",
            "gc freed {int} objects {int} kb in {int} ms",
            "input dispatcher dropped event in window {path} after {int} ms",
        ],
    ),
    SourceSpec(
        name="openssh",
        weight=0.08,
        head_kind="syslog",
        head_pattern=r"^(\S+) (\S+) sshd\[(\d+)\]: (.*)$",
        content_group=4,
        vendor="openbsd",
        sink="sink-ssh",
        templates=[
            "accepted password for {word} from {ip} port {int} ssh2",
            "failed password for invalid user {word} from {ip} port {int} ssh2",
            "connection closed by {ip}",
            "pam unix session opened for user {word} by uid {int}",
            "received disconnect from {ip} {int} bye bye",
            "reverse mapping checking getaddrinfo for host {ip} failed",
            "error maximum authentication attempts exceeded for root from {ip} port {int}",
        ],
    ),
    SourceSpec(
        name="proxifier",
        weight=0.05,
        head_kind="bracket_time",
        head_pattern=r"^\[(\d{2}:\d{2}:\d{2})\] (.*)$",
        content_group=2,
        vendor="initex",
        sink="sink-proxy",
        templates=[
            "chrome.exe open through proxy {ip} https",
            "chrome.exe close {int} bytes sent {int} bytes received lifetime {int} sec",
            "firefox.exe resolve {word} dot com through dns",
            "error connection to {ip} failed code {int}",
            # zero-variable template (F7 edge case)
            "proxy list updated",
        ],
    ),
    SourceSpec(
        name="healthapp",
        weight=0.04,
        head_kind="comp",
        head_pattern=r"^([A-Za-z_]+): (.*)$",
        content_group=2,
        vendor="huawei",
        sink="sink-health",
        templates=[
            "calculate step count {int} total {int}",
            "on standby mode battery {int} pct",
            "screen status unknown for {int} sec",
            "altitude sample {int} pressure {int} pa",
            # identical literal template also present in proxifier-like shape
            # (routing isolation edge case, F7)
            "proxy list updated",
            # regex-metachar literals (escaping edge case, F7)
            "[main] worker (init) finished a+b? eval",
        ],
    ),
]

WORD_POOL = ["alpha", "bravo", "carol", "delta", "echo"]
LEVELS = ["INFO", "WARN", "ERROR", "NOTICE"]
ANDROID_LEVELS = ["V", "D", "I", "W", "E"]
COMPS = ["Step_LSC:", "Step_SPUtils:", "Step_StandReport:"]
NOISE_WORDS = [
    "###", "corrupted", "frame", "???", "garbled", "payload", "@@@@",
    "truncated", "segment", "xx", "void", "stray",
]
HOSTS = ["node-a", "node-b", "node-c"]


def _make_pools(rng: np.random.Generator) -> dict[str, list[str]]:
    ints = [str(int(x)) for x in rng.integers(1, 99999, size=800)]
    ips = [
        f"10.{int(a)}.{int(b)}.{int(c)}"
        for a, b, c in zip(
            rng.integers(0, 256, 150), rng.integers(0, 256, 150), rng.integers(1, 255, 150)
        )
    ]
    hexes = []
    hex_chars = np.array(list("0123456789abcdef"))
    for _ in range(150):
        chars = hex_chars[rng.integers(0, 16, size=8)]
        chars[int(rng.integers(0, 8))] = str(int(rng.integers(0, 10)))  # ensure ≥1 digit
        hexes.append("".join(chars))
    seg_pool = ["var", "log", "httpd", "data", "tmp", "usr", "app", "cache", "spool", "srv"]
    paths = []
    for _ in range(80):
        depth = int(rng.integers(2, 5))
        segs = [seg_pool[int(i)] for i in rng.integers(0, len(seg_pool), depth)]
        paths.append("/" + "/".join(segs) + f"/f{int(rng.integers(0, 1000))}")
    dates = [f"2024-{m:02d}-{d:02d}" for m in range(1, 6) for d in range(1, 21)]
    times = [f"{h:02d}:{mi:02d}:{s:02d}" for h, mi, s in zip(
        rng.integers(0, 24, 300), rng.integers(0, 60, 300), rng.integers(0, 60, 300))]
    ts = [f"{d}T{t}" for d, t in zip(
        [dates[int(i)] for i in rng.integers(0, len(dates), 400)],
        [times[int(i)] for i in rng.integers(0, len(times), 400)])]
    mtimes = [f"{t}.{int(ms):03d}" for t, ms in zip(
        [times[int(i)] for i in rng.integers(0, len(times), 200)],
        rng.integers(0, 1000, 200))]
    return {
        "int": ints, "ip": ips, "hex": hexes, "path": paths, "word": WORD_POOL,
        "date": dates, "time": times, "ts": ts, "mtime": mtimes,
    }


class _Draw:
    """Bulk uniform-int buffer: one big rng call amortizes per-draw cost."""

    def __init__(self, rng: np.random.Generator, size: int = 1 << 16):
        self._rng = rng
        self._size = size
        self._buf = rng.integers(0, 1 << 31, size=size)
        self._i = 0

    def pick(self, seq):
        if self._i >= self._size:
            self._buf = self._rng.integers(0, 1 << 31, size=self._size)
            self._i = 0
        v = self._buf[self._i]
        self._i += 1
        return seq[int(v) % len(seq)]


def _render_head(kind: str, d: _Draw, pools: dict[str, list[str]]) -> str:
    if kind == "ts_level_pid":
        return f"{d.pick(pools['ts'])} {d.pick(LEVELS)} pid={d.pick(pools['int'])}"
    if kind == "date_time_level":
        return f"{d.pick(pools['date'])} {d.pick(pools['time'])} {d.pick(LEVELS[:3])}"
    if kind == "time_pid_tid_level":
        return f"{d.pick(pools['mtime'])} {d.pick(pools['int'])} {d.pick(pools['int'])} {d.pick(ANDROID_LEVELS)}"
    if kind == "syslog":
        return f"{d.pick(pools['date'])} {d.pick(HOSTS)} sshd[{d.pick(pools['int'])}]:"
    if kind == "bracket_time":
        return f"[{d.pick(pools['time'])}]"
    if kind == "comp":
        return d.pick(COMPS)
    raise ValueError(kind)


def _template_words(tpl: str) -> list[str]:
    return tpl.split(" ")


def _word_is_slot(w: str) -> bool:
    return "{" in w and "}" in w


# Pre-parsed template specs: slot structure and the (constant) star string are
# independent of the drawn values, so parsing the spec per render is pure
# per-row overhead in the generate loop. Cache key is the spec string itself.
_TPL_CACHE: dict[str, tuple[list[str | None], str, list[tuple[int, bool, str, str, str]]]] = {}


def _compile_template(tpl: str):
    """tpl spec → (literal word list with None at slots, star string,
    [(word_pos, is_kv, prefix_or_key, suffix, pool_name), ...])."""
    lit: list[str | None] = []
    star_words: list[str] = []
    slots: list[tuple[int, bool, str, str, str]] = []
    for pos, w in enumerate(_template_words(tpl)):
        if not _word_is_slot(w):
            lit.append(w)
            star_words.append(w)
            continue
        lb, rb = w.index("{"), w.index("}")
        prefix, slot, suffix = w[:lb], w[lb + 1 : rb], w[rb + 1 :]
        lit.append(None)
        if slot.startswith("kv:"):
            key = slot.split(":", 1)[1]
            slots.append((pos, True, key, "", "int"))
            star_words.append(f"{key}=<*>")
        else:
            slots.append((pos, False, prefix, suffix, slot))
            # a {word} slot value is plain-alpha → pipeline sees the whole word
            # as the variable; star form is still <*>
            star_words.append(f"{prefix}<*>{suffix}" if (prefix or suffix) else "<*>")
    return lit, " ".join(star_words), slots


def render_template(
    tpl: str, d: "_Draw", pools: dict[str, list[str]]
) -> tuple[str, str, list[str], list[str]]:
    """Render one content line from a template spec.

    Returns (content, event_template_star, var_values, word_vars):
    - event_template_star: words with variable words replaced by <*>
      (key=<*> for kv slots) — the GT analog of LogHub EventTemplate,
    - var_values: regex-matcher semantics (value only, e.g. '123'),
    - word_vars: signature-pipeline semantics (full differing word,
      e.g. 'port=123').

    Draw order (one pick per slot, template word order) is part of the fixture
    contract: the rng stream is shared across the row loop, so any reorder
    changes every later fixture byte.
    """
    compiled = _TPL_CACHE.get(tpl)
    if compiled is None:
        compiled = _compile_template(tpl)
        _TPL_CACHE[tpl] = compiled
    lit, star, slots = compiled
    out_words = lit[:]
    var_values: list[str] = []
    word_vars: list[str] = []
    pick = d.pick
    for pos, is_kv, prefix, suffix, pool in slots:
        value = pick(pools[pool])
        word = f"{prefix}={value}" if is_kv else f"{prefix}{value}{suffix}"
        out_words[pos] = word
        var_values.append(value)
        word_vars.append(word)
    return " ".join(out_words), star, var_values, word_vars


def build_template_dim(rng: np.random.Generator, pools: dict[str, list[str]]) -> list[dict]:
    """Generator-side template dimension (F3): ⟪⟫ placeholder + compiled regex.

    ``created_at`` is the per-source ordinal — it defines first-match
    precedence exactly like the reference's ``ORDER BY created_at ASC`` scan
    (sqlite-template-manager.ts:224-247).
    """
    rows: list[dict] = []
    for src in SOURCES:
        for k, tpl in enumerate(src.templates, start=1):
            # Embed one deterministic sample's values in ⟪⟫ placeholders.
            sample_draw = _Draw(np.random.default_rng(SEED + 1000 + k), size=256)
            content, star, values, _ = render_template(tpl, sample_draw, pools)
            ph_words = []
            vi = 0
            for w in _template_words(tpl):
                if not _word_is_slot(w):
                    ph_words.append(w)
                    continue
                lb, rb = w.index("{"), w.index("}")
                prefix, slot, suffix = w[:lb], w[lb + 1 : rb], w[rb + 1 :]
                if slot.startswith("kv:"):
                    key = slot.split(":", 1)[1]
                    ph_words.append(f"{key}=⟪{values[vi]}⟫")
                else:
                    ph_words.append(f"{prefix}⟪{values[vi]}⟫{suffix}")
                vi += 1
            placeholder = " ".join(ph_words)
            built = build_regex_from_template(placeholder, content)
            rows.append(
                {
                    "template_id": f"{src.name}#{k}",
                    "source": src.name,
                    "placeholder_template": placeholder,
                    "pattern": anchor_pattern(built.pattern),
                    "variables": built.variables,
                    "created_at": k,
                    "template_star": star,
                }
            )
    return rows


def generate(out_dir: str, n_rows: int, seed: int = SEED, noise_frac: float = 0.02) -> None:
    """Generate all fixture tables into ``out_dir`` (atomic via done-marker)."""
    rng = np.random.default_rng(seed)
    pools = _make_pools(rng)
    template_dim = build_template_dim(rng, pools)

    src_weights = np.array([s.weight for s in SOURCES])
    src_weights = src_weights / src_weights.sum()
    src_choice = rng.choice(len(SOURCES), size=n_rows, p=src_weights)
    noise_mask = rng.random(n_rows) < noise_frac
    draw = _Draw(rng)
    # Pre-draw per-source template choices in bulk (np.random.choice with
    # probabilities is slow when called per row).
    tpl_choice: dict[str, np.ndarray] = {}
    tpl_cursor: dict[str, int] = {}
    for si, src in enumerate(SOURCES):
        cnt = int((src_choice == si).sum())
        if src.template_weights is not None:
            w = np.array(src.template_weights)
        else:
            w = 1.0 / np.arange(1, len(src.templates) + 1)
        tpl_choice[src.name] = rng.choice(len(src.templates), size=cnt, p=w / w.sum())
        tpl_cursor[src.name] = 0

    vocab: dict[str, int] = {}

    # Columnar accumulation: the old per-row gt dict (+ the later per-column
    # list comprehensions over 300k dicts) was ~1/3 of generate()'s wall. The
    # rng draw SEQUENCE below is byte-contractual — one pick per head field /
    # template slot / noise word, in the exact old order.
    doc_ids, tokens_flat, tokens_off = [], [], [0]
    srcs, n_toks = [], []
    ev_ids: list[str] = []
    ev_templates: list[str] = []
    head_matcheds: list[bool] = []
    n_vars_col: list[int] = []
    var_concats: list[str] = []
    word_var_concats: list[str] = []
    contents: list[str] = []
    rendereds: list[str] = []

    vocab_setdefault = vocab.setdefault
    pick = draw.pick
    noise_range = range(5)
    noise_list = noise_mask.tolist()
    src_idx_list = src_choice.tolist()
    tpl_idx_list = {name: arr.tolist() for name, arr in tpl_choice.items()}

    for i in range(n_rows):
        src = SOURCES[src_idx_list[i]]
        if noise_list[i]:
            nw = 4 + int(pick(noise_range))
            line = " ".join([pick(NOISE_WORDS) for _ in range(nw)])
            ev_ids.append("__UNPARSED__")
            ev_templates.append("")
            head_matcheds.append(False)
            n_vars_col.append(0)
            var_concats.append("")
            word_var_concats.append("")
            contents.append("")
        else:
            cur = tpl_cursor[src.name]
            t_idx = tpl_idx_list[src.name][cur]
            tpl_cursor[src.name] = cur + 1
            head = _render_head(src.head_kind, draw, pools)
            content, star, values, word_vars = render_template(src.templates[t_idx], draw, pools)
            line = f"{head} {content}"
            ev_ids.append(f"{src.name}#{t_idx + 1}")
            ev_templates.append(star)
            head_matcheds.append(True)
            n_vars_col.append(len(values))
            var_concats.append("|".join(values))
            word_var_concats.append("|".join(word_vars))
            contents.append(content)
        words = line.split(" ")
        ids = [vocab_setdefault(w, len(vocab)) for w in words]
        doc_ids.append(f"doc-{i:09d}")
        tokens_flat.extend(ids)
        tokens_off.append(len(tokens_flat))
        srcs.append(src.name)
        n_toks.append(len(ids))
        rendereds.append(line)

    os.makedirs(out_dir, exist_ok=True)

    seq_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.ListArray.from_arrays(
                pa.array(tokens_off, pa.int32()), pa.array(tokens_flat, pa.int32())
            ),
            "n_tok": pa.array(n_toks, pa.int32()),
            "source": pa.array(srcs, pa.string()),
        }
    )
    # Small row groups keep the file splittable: Spark parallelizes a parquet
    # scan at row-group granularity, so one giant row group would serialize
    # the whole parse stage into a single task regardless of cluster size.
    pq.write_table(seq_tbl, os.path.join(out_dir, "sequences.parquet"), row_group_size=20_000)

    words_sorted = sorted(vocab.items(), key=lambda kv: kv[1])
    pq.write_table(
        pa.table(
            {
                "token_id": pa.array([v for _, v in words_sorted], pa.int32()),
                "text": pa.array([w for w, _ in words_sorted], pa.string()),
            }
        ),
        os.path.join(out_dir, "vocab.parquet"),
    )

    pq.write_table(
        pa.table(
            {
                "template_id": pa.array([r["template_id"] for r in template_dim]),
                "source": pa.array([r["source"] for r in template_dim]),
                "placeholder_template": pa.array([r["placeholder_template"] for r in template_dim]),
                "pattern": pa.array([r["pattern"] for r in template_dim]),
                "variables": pa.array([r["variables"] for r in template_dim], pa.list_(pa.string())),
                "created_at": pa.array([r["created_at"] for r in template_dim], pa.int64()),
                "template_star": pa.array([r["template_star"] for r in template_dim]),
            }
        ),
        os.path.join(out_dir, "templates.parquet"),
    )

    pq.write_table(
        pa.table(
            {
                "source": pa.array([s.name for s in SOURCES]),
                "head_pattern": pa.array([s.head_pattern for s in SOURCES]),
                "content_group": pa.array([s.content_group for s in SOURCES], pa.int32()),
                "vendor": pa.array([s.vendor for s in SOURCES]),
                "sink": pa.array([s.sink for s in SOURCES]),
            }
        ),
        os.path.join(out_dir, "sources.parquet"),
    )

    line_nos = list(range(1, n_rows + 1))
    gt_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "line_no": pa.array(line_nos, pa.int64()),
            "source": pa.array(srcs),
            "event_id": pa.array(ev_ids),
            "event_template": pa.array(ev_templates),
            "n_tok": pa.array(n_toks, pa.int32()),
            "head_matched": pa.array(head_matcheds, pa.bool_()),
            "n_vars": pa.array(n_vars_col, pa.int32()),
            "var_concat": pa.array(var_concats),
            "word_var_concat": pa.array(word_var_concats),
            "rendered": pa.array(rendereds),
            "content": pa.array(contents),
        }
    )
    pq.write_table(gt_tbl, os.path.join(out_dir, "ground_truth.parquet"), row_group_size=20_000)

    # Eval labels fixture: deterministic perturbation of GT — oversplit two
    # templates by line parity (pure split), merge two others (impure merge).
    pred = []
    for line_no, gid in zip(line_nos, ev_ids):
        if gid == "apache#1":
            pred.append(f"apache#1{'a' if line_no % 2 == 0 else 'b'}")
        elif gid in ("hdfs#1", "hdfs#2"):
            pred.append("hdfs#merged")
        else:
            pred.append(gid)
    pq.write_table(
        pa.table(
            {
                "line_no": pa.array(line_nos, pa.int64()),
                "gt_id": pa.array(ev_ids),
                "pred_id": pa.array(pred),
            }
        ),
        os.path.join(out_dir, "labels.parquet"),
    )

    with open(os.path.join(out_dir, "_DONE.json"), "w") as f:
        json.dump(
            {"n_rows": n_rows, "seed": seed, "vocab_size": len(vocab), "gen_version": GEN_VERSION},
            f,
        )


GEN_VERSION = 3  # bump to invalidate previously-generated fixture dirs


def ensure_fixtures(sf_name: str, base_dir: str | None = None, n_rows: int | None = None) -> str:
    """Generate fixtures for an sf once; reuse afterwards. Returns dir path."""
    base = base_dir or os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "fixtures")
    out_dir = os.path.join(base, sf_name)
    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("gen_version") == GEN_VERSION:
                return out_dir
    generate(out_dir, n_rows or SF_ROWS.get(sf_name, 30_000))
    return out_dir


def fixtures_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our fixture dir."""
    return ensure_fixtures(os.path.basename(sf_dir.rstrip("/")))


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    print(ensure_fixtures(sf))
