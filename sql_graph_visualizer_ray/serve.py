"""Minimal HTTP JSON serving layer over the NO-RAY serving primitives —
the engine-side analogue of the reference's primary user surface, its
GraphQL/REST/WebSocket servers
(``/root/reference/schema/schema.graphqls:36-61``; resolvers
``internal/interfaces/graphql/schema.resolvers.go:25-236``; REST + viz
servers ``cmd/main.go:222,:345``). Every resolver maps onto an endpoint:

=====================================  =====================  ===================
reference resolver                     endpoint               engine primitive
=====================================  =====================  ===================
``node(id)``                           GET /node/<id>         LakeTable.lookup
``searchNodes(query)``                 GET /search?q=         LakeTable.search_any
``nodesByType(type)`` (generalized)    GET /where?col&op&val  LakeTable.search_where
``graph`` (bounded)                    GET /graph?limit=      LakeTable.head
``relationshipsByType(type)``          GET /relationships?    EdgeLake search
viz click-to-expand                    GET /neighbors/<id>    EdgeLake.neighbors
viz k-hop expand                       GET /expand?seeds=     EdgeLake.expand
``graphUpdates`` subscription          GET /updates?after=    changes_table long-poll
``config``                             GET /config            manifest snapshot
whole Query root (GraphQL syntax)      POST /graphql          execute_graphql
observability (perf monitor analogue)  GET /metrics           _RouteMetrics
=====================================  =====================  ===================

``POST /graphql`` additionally speaks the reference's ACTUAL query
language for the whole ``Query`` root (``schema.graphqls:36-53``): a
dependency-free parser for the subset the schema needs (named operations,
variables, aliases, inline args; sub-selections accepted and full objects
returned), executing each top-level field against the primitives above
and answering ``{"data": ..., "errors": [...]}`` per the GraphQL wire
contract — ``Node`` as ``{id,label,properties}`` and ``Relationship`` as
``{from,to,type,properties}`` with ``properties`` a JSON string, exactly
the reference's wire types (``schema.graphqls:4-16``).

Design: a stdlib ``ThreadingHTTPServer`` — no Ray session anywhere on a
request path. Every read rides the keyed / manifest-stats-pruned serving
primitives (O(keys) or O(matching files), never O(lake)), so one process
in front of a 100 TB lake serves point reads at millisecond latency while
replay/compaction run elsewhere; scale-out is N stateless server processes
over the same lake directory (the manifest is immutable-per-version, CAS
published). The ``GraphUpdates`` push subscription becomes a LONG-POLL:
``/updates?after=<version>`` blocks up to ``wait`` seconds for the next
delta commit and returns its rows plus the next cursor — the same
at-least-once contract as ``feed.ChangeFeedCursor`` with the offset kept
client-side.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pyarrow as pa

from .pipelines.cdc import CANONICAL_KEYS, LakeTable
from .state.manifest import MANIFEST_NAME, Manifest

_MAX_LIMIT = 10_000  # serving-path row cap; batch reads use read_final


def _rows(t: pa.Table) -> list[dict]:
    return t.to_pylist()


def _json_default(o):
    import datetime

    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    if isinstance(o, bytes):
        return o.hex()
    return str(o)


def _parse_value(raw: str):
    """Query-string value -> typed predicate value (int, float, or str).
    search/lookup cast to the stored column type themselves."""
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            continue
    return raw


def _typed_value(raw, typ: pa.DataType):
    """Coerce a client-supplied scalar to a stored column's type. String
    columns keep the raw text VERBATIM — eager int-parsing would make
    numeric-looking string keys like ``"00012"`` unreachable (int 12 can
    never equal the stored string). Conversion failures surface as
    ``ValueError`` (-> HTTP 400 / a GraphQL error entry), never an Arrow
    exception escaping the handler: ``pa.ArrowTypeError`` subclasses
    ``TypeError``, which the per-field/except chains do not catch."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return str(raw)
    try:
        return pa.scalar(_parse_value(str(raw)), typ).as_py()
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, OverflowError) as e:
        raise ValueError(f"value {raw!r} does not fit column type {typ}") from e


_GQL_TOKEN = None  # compiled lazily (regex import cost off the module path)


def _gql_tokens(src: str) -> list[str]:
    """Tokenize the GraphQL query subset: names, $vars, strings, numbers,
    punctuation. Comments (#...) and commas are insignificant per spec."""
    global _GQL_TOKEN
    import re

    if _GQL_TOKEN is None:
        _GQL_TOKEN = re.compile(
            r'"(?:[^"\\]|\\.)*"|\$?[_A-Za-z][_0-9A-Za-z]*'
            r"|-?\d+(?:\.\d+)?|[{}():,!\[\]=@]|\#[^\n]*"
        )
    return [t for t in _GQL_TOKEN.findall(src) if not t.startswith("#") and t != ","]


def parse_graphql(
    src: str, variables: dict | None = None
) -> tuple[str, list[dict]]:
    """Parse the reference's Query/Mutation-root subset
    (``/root/reference/schema/schema.graphqls:36-61``): an optional
    ``query|mutation Name($v: T)`` header, then one selection set of
    top-level fields with optional ``(name: value)`` args and optional
    (ignored) sub-selections. Returns ``(operation, [{"field", "alias",
    "args"}])``. Values: strings, ints, floats, and ``$variables``."""
    variables = variables or {}
    toks = _gql_tokens(src)
    i = 0

    def peek():
        return toks[i] if i < len(toks) else None

    def eat(expected=None):
        nonlocal i
        if i >= len(toks):
            raise ValueError("unexpected end of query")
        t = toks[i]
        if expected is not None and t != expected:
            raise ValueError(f"expected {expected!r}, got {t!r}")
        i += 1
        return t

    op = "query"
    if peek() in ("query", "mutation"):
        op = eat()
        if peek() not in ("{", "("):
            eat()  # operation name
        if peek() == "(":  # variable definitions: skip to matching ')'
            depth = 0
            while True:
                t = eat()
                depth += t == "("
                depth -= t == ")"
                if depth == 0:
                    break
    elif peek() == "subscription":
        raise ValueError(
            "subscriptions are not served over POST — the graphUpdates "
            "subscription is a long-poll: GET /updates?after=<version>"
            "&wait=<s>"
        )

    def value(tok):
        if tok.startswith('"'):
            return json.loads(tok)
        if tok.startswith("$"):
            name = tok[1:]
            if name not in variables:
                raise ValueError(f"missing variable ${name}")
            return variables[name]
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            return tok  # enum/bool-ish name

    eat("{")
    fields = []
    while peek() != "}":
        name = eat()
        if not name[0].isalpha() and name[0] != "_":
            raise ValueError(f"expected a field name, got {name!r}")
        alias = None
        if peek() == ":":
            eat()
            alias, name = name, eat()
        args = {}
        if peek() == "(":
            eat()
            while peek() != ")":
                k = eat()
                eat(":")
                args[k] = value(eat())
            eat(")")
        if peek() == "{":  # sub-selection: skip — full objects are returned
            depth = 0
            while True:
                t = eat()
                depth += t == "{"
                depth -= t == "}"
                if depth == 0:
                    break
        fields.append({"field": name, "alias": alias or name, "args": args})
    return op, fields


def execute_graphql(
    lake,
    edges,
    src: str,
    variables: dict | None = None,
    *,
    limit: int = 1000,
    transform=None,
) -> dict:
    """Execute the reference's Query root against the lake primitives:
    ``graph`` -> bounded head, ``node(id)`` -> keyed lookup,
    ``nodesByType(type)`` -> predicate search on the lake's type-ish
    column, ``searchNodes(query)`` -> ``search_any``,
    ``relationshipsByType(type)`` -> edge-lake search, ``config`` ->
    manifest snapshot. Nodes/relationships take the schema's wire shape:
    ``{id,label,properties}`` / ``{from,to,type,properties}`` with
    ``properties`` a JSON string (``schema.graphqls:4-16``)."""
    m = lake.manifest
    keys = list(m.key_columns)
    label_col = next(
        (c for c in ("node_type", "label", "role") if c in m.payload_schema.names),
        None,
    )

    def node_of(row: dict) -> dict:
        rid = ":".join(str(row[k]) for k in keys if k in row)
        return {
            "id": rid,
            "label": str(row.get(label_col, "Node")) if label_col else "Node",
            "properties": json.dumps(row, default=_json_default),
        }

    def rel_of(row: dict) -> dict:
        return {
            "from": str(row["source_id"]),
            "to": str(row["target_id"]),
            "type": row.get("relation_type", ""),
            "properties": json.dumps(row, default=_json_default),
        }

    def need_edges():
        if edges is None:
            raise LookupError("this server has no edge lake")
        return edges

    def run(field: str, args: dict):
        if field == "graph":
            nodes = [node_of(r) for r in _rows(lake.head(limit))]
            rels = (
                [rel_of(r) for r in _rows(edges.lake.head(limit))]
                if edges is not None
                else []
            )
            return {"nodes": nodes, "relationships": rels}
        if field == "node":
            key_type = m.payload_schema.field("conv_id").type
            kid = _typed_value(args["id"], key_type)
            t = lake.lookup([kid])
            rows = _rows(t)
            return node_of(rows[0]) if rows else None
        if field == "nodesByType":
            if label_col is None:
                raise ValueError(
                    "lake has no type-ish column (node_type/label/role)"
                )
            t = lake.search(label_col, "=", args["type"], max_result_keys=limit)
            return [node_of(r) for r in _rows(t)]
        if field == "searchNodes":
            t = lake.search_any(str(args["query"]), max_result_keys=limit)
            return [node_of(r) for r in _rows(t)]
        if field == "relationshipsByType":
            t = need_edges().lake.search(
                "relation_type", "=", args["type"], max_result_keys=limit
            )
            return [rel_of(r) for r in _rows(t)]
        if field == "config":
            return {
                "neo4j": {
                    "uri": f"lake://{lake.path}",
                    "username": "",
                    "password": "",
                }
            }
        raise ValueError(f"unknown Query field {field!r}")

    def run_mutation(field: str, args: dict):
        # Mutation root (schema.graphqls:56-59). The reference's resolver
        # is a stub that returns true without doing anything
        # (schema.resolvers.go:17-22); here transformData actually kicks
        # the ingest when the server is configured with a transform
        # source — duplicate/concurrent triggers are safe because replay
        # is epoch-fenced (applied epochs are skipped).
        if field == "transformData":
            if transform is None:
                raise ValueError(
                    "no transform source configured (start serve() with "
                    "transform_source=) — transformData has nothing to run"
                )
            return bool(transform())
        raise ValueError(f"unknown Mutation field {field!r}")

    op, fields = parse_graphql(src, variables)
    data, errors = {}, []
    for f in fields:
        try:
            data[f["alias"]] = (run_mutation if op == "mutation" else run)(
                f["field"], f["args"]
            )
        except (ValueError, KeyError, LookupError, RuntimeError) as e:
            data[f["alias"]] = None
            errors.append({"message": str(e), "path": [f["alias"]]})
    out: dict = {"data": data}
    if errors:
        out["errors"] = errors
    return out


# the served route vocabulary — metrics keys are clamped to this set so an
# unknown-path scanner cannot grow server memory one dict entry (plus a
# 1024-slot deque) per random URL segment
_KNOWN_ROUTES = frozenset(
    {
        "/",
        "/metrics",
        "/config",
        "/graph",
        "/node",
        "/nodes",
        "/search",
        "/where",
        "/relationships",
        "/neighbors",
        "/expand",
        "/updates",
        "/monitor",
        "/api",
        "/performance",
        "/benchmarks",
        "/graphql",
    }
)


class _RouteMetrics:
    """Per-route request counters + a bounded latency window (last
    ``window`` samples per route) — lock-guarded, cheap enough to sit on
    every request. Quantiles are computed at snapshot time, not on the
    hot path. Keys are bounded: anything outside ``_KNOWN_ROUTES`` (404
    fodder, port scanners) shares the one ``/_other`` slot."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._window = window
        self._count: dict[str, int] = {}
        self._lat: dict[str, deque] = {}

    def record(self, route: str, ms: float) -> None:
        if route not in _KNOWN_ROUTES:
            route = "/_other"
        with self._lock:
            self._count[route] = self._count.get(route, 0) + 1
            d = self._lat.get(route)
            if d is None:
                d = self._lat[route] = deque(maxlen=self._window)
            d.append(ms)

    def snapshot(self) -> dict:
        with self._lock:
            lat = {r: sorted(d) for r, d in self._lat.items()}
            count = dict(self._count)

        def q(xs, p):
            return round(xs[min(len(xs) - 1, int(p * len(xs)))], 2)

        return {
            r: {
                "count": count[r],
                "window": len(xs),
                "p50_ms": q(xs, 0.50),
                "p95_ms": q(xs, 0.95),
                "max_ms": round(xs[-1], 2),
            }
            for r, xs in lat.items()
        }


class _Handler(BaseHTTPRequestHandler):
    server_version = "sgvray/1"
    _lake_view: LakeTable | None = None
    _edges_pin = None

    # -- plumbing -------------------------------------------------------
    def log_message(self, fmt, *args):  # route through the server hook
        self.server.log(fmt % args)

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=_json_default).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    @property
    def lake(self) -> LakeTable:
        """The lake view PINNED for this request: LakeTable methods
        dereference ``self.manifest`` several times per call, so a refresh
        landing mid-request on a shared mutable table could mix two
        manifest versions in one read (ThreadingHTTPServer runs handlers
        concurrently). Each request takes one immutable snapshot up front;
        ``do_GET``/``do_POST`` reset the pin per request (keep-alive
        connections reuse the handler object)."""
        view = self._lake_view
        if view is None:
            view = self._lake_view = self.server.lake_view()
        return view

    @property
    def edges(self):
        """The edge-lake view pinned for this request (see ``lake``).
        ``None`` stays None cheaply: no-edge servers skip the stat."""
        view = self._edges_pin
        if view is None:
            view = self._edges_pin = self.server.edges_view()
        return view

    def _need_edges(self):
        if self.edges is None:
            raise LookupError(
                "this server has no edge lake (start serve() with edges=)"
            )
        return self.edges

    def _key(self, raw: str):
        """Path id segment -> the key column's stored type (string keys
        keep the raw text, so ids like "00012" stay reachable)."""
        key_type = self.lake.manifest.payload_schema.field("conv_id").type
        return _typed_value(unquote(raw), key_type)

    # -- routes -----------------------------------------------------------
    def do_GET(self):  # noqa: N802 (stdlib handler contract)
        self._lake_view = None  # fresh snapshots per request (keep-alive)
        self._edges_pin = None
        url = urlparse(self.path)
        q = parse_qs(url.query)
        parts = [p for p in url.path.split("/") if p]
        route = f"/{parts[0]}" if parts else "/"
        t0 = time.perf_counter()
        try:
            return self._dispatch(url, q, parts)
        finally:
            self.server.metrics.record(
                route, (time.perf_counter() - t0) * 1000.0
            )

    def do_POST(self):  # noqa: N802 (stdlib handler contract)
        self._lake_view = None  # fresh snapshots per request (keep-alive)
        self._edges_pin = None
        parts = [p for p in urlparse(self.path).path.split("/") if p]
        if parts[:1] == ["benchmarks"]:
            t0 = time.perf_counter()
            try:
                return self._post_benchmarks(parts)
            finally:
                self.server.metrics.record(
                    "/benchmarks", (time.perf_counter() - t0) * 1000.0
                )
        # metrics key is the actual first path segment (record() clamps
        # anything outside _KNOWN_ROUTES to /_other) — a scanner POSTing
        # random paths must not pollute the /graphql latency window
        route = f"/{parts[0]}" if parts else "/"
        t0 = time.perf_counter()
        try:
            if urlparse(self.path).path != "/graphql":
                return self._send(404, {"error": f"no POST route {self.path}"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                src = body["query"]
            except (ValueError, KeyError) as e:
                return self._send(400, {"errors": [{"message": f"bad request: {e}"}]})
            try:
                out = execute_graphql(
                    self.lake,
                    self.edges,
                    src,
                    body.get("variables"),
                    transform=self.server.transform,
                )
            except ValueError as e:  # parse error: whole request malformed
                return self._send(400, {"errors": [{"message": str(e)}]})
            return self._send(200, out)
        finally:
            self.server.metrics.record(
                route, (time.perf_counter() - t0) * 1000.0
            )

    def _send_html(self, code: int, body: str) -> None:
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _dispatch(self, url, q, parts):
        try:
            if url.path == "/":
                # the reference's visualization page (viz server "/",
                # cmd/main.go:444-447) — inline, CDN-free
                from .viz import VIZ_HTML

                return self._send_html(200, VIZ_HTML)
            if url.path == "/api/graph":
                # the reference's viz feed (cmd/main.go:393-430 wire shape)
                from .viz import graph_payload

                return self._send(
                    200,
                    graph_payload(self.lake, self.edges, self._limit(q)),
                )
            if url.path == "/performance":
                # the reference's performance dashboard page
                # (cmd/main.go:440-443), fed by /monitor + /metrics +
                # /benchmarks instead of a WebSocket
                from .viz import DASHBOARD_HTML

                return self._send_html(200, DASHBOARD_HTML)
            if url.path == "/api/health":
                return self._send(200, self._health())
            if parts[:1] == ["benchmarks"]:
                if len(parts) == 1:
                    return self._send(
                        200,
                        {
                            "runs": [
                                r.to_dict()
                                for r in self.server.bench_service().list_executions()
                            ]
                        },
                    )
                if len(parts) == 2:
                    try:
                        r = self.server.bench_service().get_result(parts[1])
                    except KeyError as e:
                        # unknown run id is a 404, not a bad request — plain
                        # LookupError skips the (ValueError, KeyError) -> 400
                        # clause below and lands on the 404 handler
                        raise LookupError(str(e.args[0])) from None
                    return self._send(200, r.to_dict())
            if url.path == "/metrics":
                return self._send(200, self._metrics())
            if url.path == "/config":
                return self._send(200, self._config())
            if url.path == "/graph":
                return self._send(200, self._graph(q))
            if parts[:1] == ["node"] and len(parts) == 2:
                return self._node(parts[1], q)
            if url.path == "/nodes":
                return self._nodes(q)
            if url.path == "/search":
                return self._search(q)
            if url.path == "/where":
                return self._where(q)
            if url.path == "/relationships":
                return self._relationships(q)
            if parts[:1] == ["neighbors"] and len(parts) == 2:
                return self._neighbors(parts[1], q)
            if url.path == "/expand":
                return self._expand(q)
            if url.path == "/updates":
                return self._updates(q)
            if url.path == "/monitor":
                return self._send(200, self._monitor(q))
            return self._send(404, {"error": f"no route {url.path}"})
        except (ValueError, KeyError) as e:
            return self._send(400, {"error": str(e)})
        except LookupError as e:
            return self._send(404, {"error": str(e)})
        except RuntimeError as e:
            return self._send(409, {"error": str(e)})

    def _metrics(self) -> dict:
        """Serving observability — the engine-side analogue of the
        reference's realtime performance monitor
        (``/root/reference/internal/application/services/benchmark/
        realtime_performance_monitor.go:287-480``, which samples query
        latency and raises threshold alerts). Here: per-route request
        counts + latency quantiles over a bounded in-memory window, plus
        the lake's cumulative lineage counters — everything a poller needs
        to alert on (p95 regression, error ratio, tombstone growth)."""
        m = self.lake.manifest
        return {
            "routes": self.server.metrics.snapshot(),
            "lake": {
                "version": m.version,
                "applied_epoch": m.applied_epoch,
                "counters": m.data["counters"],
                "data_files": sum(
                    len(b["files"]) for b in m.data["buckets"].values()
                ),
            },
        }

    def _post_benchmarks(self, parts) -> None:
        """POST /benchmarks starts a serving-probe run (the dashboard's
        Start button — the reference dashboard ships the buttons but its
        backend benchmark tools are a TODO, ``cmd/main.go:671-673``; here
        they work); POST /benchmarks/<id>/cancel stops one. Bounded: only
        the no-Ray serving probe, duration clamped to 30 s, one concurrent
        run — a dashboard control, not a load-test API."""
        try:
            if len(parts) == 3 and parts[2] == "cancel":
                if not self.server.bench_service().cancel(parts[1]):
                    return self._send(404, {"error": f"no run {parts[1]}"})
                return self._send(200, {"id": parts[1], "cancelled": True})
            if len(parts) != 1:
                return self._send(404, {"error": "POST /benchmarks or "
                                                 "/benchmarks/<id>/cancel"})
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            from .monitor import BenchmarkConfig

            cfg = BenchmarkConfig(
                test_type=str(body.get("test_type", "point_select")),
                duration_s=min(float(body.get("duration_s", 3.0)), 30.0),
                params=dict(body.get("params", {})),
            )
            # inside the try: an empty lake makes the probe tool
            # unavailable, which must be a 409, not a dropped connection
            rid = self.server.probe_service().execute_benchmark(
                cfg, "serving_probe"
            )
            return self._send(202, {"id": rid, "status": "pending"})
        except (ValueError, KeyError) as e:
            return self._send(400, {"error": str(e)})
        except RuntimeError as e:  # concurrency cap
            return self._send(409, {"error": str(e)})

    def _health(self) -> dict:
        """GET /api/health — the reference's health probe
        (``cmd/main.go:249-288``): overall status plus per-dependency
        connectivity (its database/neo4j pings become the lake and edge
        lake manifests here)."""
        try:
            m = self.lake.manifest
            lake_status = f"connected (v{m.version})"
            healthy = True
        except Exception as e:
            lake_status, healthy = f"error: {e}", False
        return {
            "status": "healthy" if healthy else "degraded",
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "uptime_s": round(time.time() - self.server.started_ts, 1),
            "lake": lake_status,
            "edges": "attached" if self.edges is not None else "none",
        }

    def _monitor(self, q) -> dict:
        """Lake-health snapshot + threshold alerts — the HTTP face of
        ``monitor.RealtimeMonitor`` (the reference broadcasts the same
        collect→metrics→alerts round over WebSocket,
        ``realtime_performance_monitor.go:331-366``; pull-pollers here GET
        this route instead). Thresholds are query params
        (``?max_delta_files_per_bucket=8&max_bucket_skew=2``), so an
        external alerter needs no engine config. Rate fields
        (``events_per_sec``, ``commits_since_last``) are derived between
        consecutive polls of THIS server's collector."""
        from .monitor import AlertThresholds, check_alerts

        sample = self.server.monitor_sample()
        kw = {}
        for name, cast in (
            ("slow_probe_ms", float),
            ("max_commit_lag_s", float),
            ("max_delta_files_per_bucket", int),
            ("max_bucket_skew", float),
            ("max_tombstone_ratio", float),
        ):
            if name in q:
                kw[name] = cast(q[name][0])
        d = sample.to_dict()
        d["alerts"] = [
            a.to_dict() for a in check_alerts(sample, AlertThresholds(**kw))
        ]
        return d

    def _config(self) -> dict:
        m = self.lake.manifest
        return {
            "version": m.version,
            "applied_epoch": m.applied_epoch,
            "num_buckets": m.num_buckets,
            "key_columns": list(m.key_columns),
            "counters": m.data.get("counters", {}),
            "payload_schema": {f.name: str(f.type) for f in m.payload_schema},
            "has_edges": self.edges is not None,
        }

    def _limit(self, q, default=100) -> int:
        n = int(q.get("limit", [default])[0])
        if not 0 < n <= _MAX_LIMIT:
            raise ValueError(f"limit must be in 1..{_MAX_LIMIT}")
        return n

    def _columns(self, q):
        cols = q.get("columns", [None])[0]
        return cols.split(",") if cols else None

    def _graph(self, q) -> dict:
        limit = self._limit(q)
        nodes = self.lake.head(limit, columns=self._columns(q))
        rels = (
            self.edges.lake.head(limit)
            if self.edges is not None
            else pa.table({})
        )
        return {
            "nodes": _rows(nodes),
            "relationships": _rows(rels) if rels.num_rows else [],
            "truncated_at": limit,
        }

    def _node(self, raw_id: str, q) -> None:
        t = self.lake.lookup([self._key(raw_id)], columns=self._columns(q))
        if t.num_rows == 0:
            return self._send(404, {"error": f"no live rows for id {raw_id!r}"})
        return self._send(200, {"rows": _rows(t)})

    def _nodes(self, q) -> None:
        raw = q.get("ids", [""])[0]
        if not raw:
            raise ValueError("ids= is required (comma-separated)")
        keys = [self._key(r) for r in raw.split(",")]
        turns = q.get("turns", [None])[0]
        t = self.lake.lookup(
            keys,
            turns=[int(x) for x in turns.split(",")] if turns else None,
            columns=self._columns(q),
        )
        return self._send(200, {"rows": _rows(t)})

    def _search(self, q) -> None:
        term = q.get("q", [""])[0]
        if not term:
            raise ValueError("q= is required")
        sc = q.get("search_columns", [None])[0]
        t = self.lake.search_any(
            term,
            search_columns=sc.split(",") if sc else None,
            columns=self._columns(q),
            max_result_keys=self._limit(q, default=_MAX_LIMIT),
        )
        return self._send(200, {"rows": _rows(t)})

    def _where(self, q) -> None:
        cols, ops, vals = q.get("col", []), q.get("op", []), q.get("value", [])
        if not cols or not (len(cols) == len(ops) == len(vals)):
            raise ValueError("need matching col=/op=/value= triples")
        m = self.lake.manifest
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))

        def coerce(c: str, op: str, v: str):
            # schema-aware: a string column's value stays the raw text
            # (GET /where?col=conv_id&value=00012 must compare the STRING
            # "00012", not int 12); ``contains`` matches on the stringified
            # column, so its value is always raw; timestamp ISO strings are
            # parsed by search_where itself. Everything else int/float-folds.
            phys = ren_in.get(c, c)
            if op == "contains":
                return v
            if phys in m.payload_schema.names:
                typ = m.payload_schema.field(phys).type
                if not (pa.types.is_timestamp(typ)):
                    return _typed_value(v, typ)
            return _parse_value(v)

        preds = [
            (c, op, coerce(c, op, v)) for c, op, v in zip(cols, ops, vals)
        ]
        t = self.lake.search_where(
            preds,
            columns=self._columns(q),
            max_result_keys=self._limit(q, default=_MAX_LIMIT),
        )
        return self._send(200, {"rows": _rows(t)})

    def _relationships(self, q) -> None:
        rel_type = q.get("type", [""])[0]
        if not rel_type:
            raise ValueError("type= is required")
        t = self._need_edges().lake.search(
            "relation_type",
            "==",
            rel_type,
            max_result_keys=self._limit(q, default=_MAX_LIMIT),
        )
        return self._send(200, {"rows": _rows(t)})

    def _neighbors(self, raw_id: str, q) -> None:
        t = self._need_edges().neighbors(
            int(raw_id), direction=q.get("direction", ["both"])[0]
        )
        return self._send(200, {"rows": _rows(t)})

    def _expand(self, q) -> None:
        raw = q.get("seeds", [""])[0]
        if not raw:
            raise ValueError("seeds= is required (comma-separated ints)")
        t = self._need_edges().expand(
            [int(x) for x in raw.split(",")],
            hops=int(q.get("hops", [1])[0]),
            direction=q.get("direction", ["out"])[0],
        )
        return self._send(200, {"rows": _rows(t)})

    def _updates(self, q) -> None:
        """GraphUpdates-shaped long-poll: the next data commit after
        ``after``, blocking up to ``wait`` seconds for one to land. The
        client advances its own cursor to the returned ``cursor``.
        Unservable positions (rewrite commit / compacted-away feed) return
        409 with the resync point — same loud contract as
        ``ChangeFeedCursor.poll``. Each probe takes a fresh immutable view
        via ``lake_view()`` (a stat per iteration, a JSON parse only when
        the manifest actually changed) — it never mutates the lake other
        handlers are reading mid-request."""
        after = int(q.get("after", [-1])[0])
        wait = min(float(q.get("wait", [0])[0]), 30.0)
        deadline = time.monotonic() + wait
        while True:
            lake = self._lake_view = self.server.lake_view()
            v = next(iter(lake.data_commits_after(after)), None)
            if v is not None:
                try:
                    t = lake.changes_table(v)
                except KeyError as e:
                    return self._send(
                        409,
                        {
                            "error": str(e),
                            "resync_to": lake.manifest.version,
                            "hint": "read a full snapshot at resync_to and "
                            "continue with after=resync_to",
                        },
                    )
                return self._send(
                    200, {"version": v, "cursor": v, "rows": _rows(t)}
                )
            if time.monotonic() >= deadline:
                return self._send(200, {"cursor": after, "rows": []})
            time.sleep(min(0.1, max(0.0, deadline - time.monotonic())))


class GraphServer:
    """Embeddable server: ``with GraphServer(lake_path) as s: GET s.url...``.

    ``edges_path`` optionally attaches an ``EdgeLake`` (with its reverse
    index if one exists on disk) for the relationship endpoints. ``port=0``
    picks a free port. Runs on a daemon thread; ``close()`` (or the context
    manager) shuts it down."""

    def __init__(
        self,
        lake_path: str,
        *,
        edges_path: str | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        quiet: bool = True,
        transform_source: str | None = None,
    ):
        self._lake_path = lake_path
        self._transform_source = transform_source
        self._mlock = threading.Lock()
        self._mtoken = None
        # open-existing ONLY: LakeTable.open would CREATE a default
        # transcript-schema lake at a mistyped/empty path, and the server
        # would then silently serve an empty lake (or poison a directory
        # meant for a differently-keyed table)
        m = Manifest.load(lake_path)
        if m is None:
            raise LookupError(
                f"no lake at {lake_path} (MANIFEST.json missing) — the "
                "server never creates lakes; build one with LakeTable.open "
                "/ `cli run` first"
            )
        self.lake = LakeTable(lake_path, m, readonly=True)
        self._edges_path = edges_path
        self._elock = threading.Lock()
        self._etoken = ()  # never a valid token: first view always builds
        self.edges = self.edges_view()
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.daemon_threads = True
        self._httpd.lake_view = self.lake_view
        self._httpd.edges_view = self.edges_view
        self._httpd.log = (lambda msg: None) if quiet else print
        self._httpd.metrics = _RouteMetrics()
        self._httpd.monitor_sample = self._monitor_sample
        self._httpd.bench_service = self._bench_service
        self._httpd.probe_service = self._probe_service
        self._httpd.transform = (
            self._run_transform if transform_source else None
        )
        self._httpd.started_ts = time.time()
        self._collector = None  # built on first /monitor hit
        self._bench = None  # built on first /benchmarks hit
        self._clock = threading.Lock()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def _monitor_sample(self):
        """One collector round for ``/monitor`` — serialized (the collector
        keeps last-poll state for rate derivation; concurrent collects would
        race it) and reusing the stat-guarded ``lake_view`` so an idle
        poller pays a stat, not a manifest parse."""
        from .monitor import LakeStatsCollector

        with self._clock:
            if self._collector is None:
                self._collector = LakeStatsCollector(
                    self._lake_path, view_fn=self.lake_view
                )
            return self._collector.collect()

    def _run_transform(self) -> bool:
        """``mutation { transformData }`` backend: kick a detached replay
        of the configured changelog into this lake (``cli run`` in a child
        process — the serving process itself stays no-Ray). Returns True
        once the child is launched; progress lands as ordinary commits, so
        clients watch it through ``/updates`` or ``/monitor``. Safe to
        spam: replay is epoch-fenced, a concurrent second child sees the
        applied watermark (or loses the commit CAS) and no-ops."""
        import subprocess
        import sys as _sys

        # the child must import this package regardless of the server's
        # cwd: prepend the package's parent to its PYTHONPATH
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            pkg_parent + os.pathsep + env["PYTHONPATH"]
            if env.get("PYTHONPATH")
            else pkg_parent
        )
        subprocess.Popen(
            [
                _sys.executable,
                "-m",
                "sql_graph_visualizer_ray.cli",
                "run",
                self._transform_source,
                self._lake_path,
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,
            env=env,
        )
        return True

    def _bench_service(self):
        """The server's benchmark registry (dashboard Start/Stop buttons):
        one concurrent run, short timeout — dashboard-scale by
        construction. Listing/polling runs needs no tool, so the registry
        itself always exists (GET /benchmarks on an empty lake is
        ``{"runs": []}``, not a 409); the probe tool is registered lazily
        by ``_probe_service`` on the POST path."""
        from .monitor import BenchmarkService

        with self._clock:
            if self._bench is None:
                self._bench = BenchmarkService(
                    max_concurrent=1, default_timeout_s=60.0
                )
            return self._bench

    def _probe_service(self):
        """The registry with the serving-probe tool registered (the POST
        /benchmarks path). Registration re-attempts on each start request,
        so a lake that was empty at server start becomes benchmarkable as
        soon as it has live keys; a still-empty lake raises the
        availability RuntimeError (HTTP 409)."""
        from .monitor import ServingProbeTool

        svc = self._bench_service()
        if "serving_probe" not in svc.available_tools():
            lake = self.lake_view()
            keys = lake.head(8).column(lake.key_columns[0]).to_pylist()
            svc.register_tool(ServingProbeTool(self._lake_path, keys))
        return svc

    def lake_view(self) -> LakeTable:
        """An immutable view of the lake at its CURRENT committed version.

        Freshness is stat-guarded: reload and re-parse MANIFEST.json only
        when its (mtime_ns, size, ino) token changed — N idle ``/updates``
        long-pollers cost N stats per 100 ms, not N full JSON parses.
        Correctness: the returned table is ``readonly`` and its Manifest
        object is never mutated after publication (a refresh swaps in a
        NEW LakeTable), so a handler that pinned a view mid-request keeps
        reading one consistent version even while this method rolls the
        shared pointer forward."""
        p = os.path.join(self._lake_path, MANIFEST_NAME)
        try:
            st = os.stat(p)
            token = (st.st_mtime_ns, st.st_size, st.st_ino)
        except FileNotFoundError:
            token = None
        with self._mlock:
            if token != self._mtoken:
                m = Manifest.load(self._lake_path)
                if m is not None:
                    self.lake = LakeTable(self._lake_path, m, readonly=True)
                self._mtoken = token
            return self.lake

    def edges_view(self):
        """Per-request EdgeLake view, stat-guarded like ``lake_view`` —
        the forward and reverse manifests together form the change token,
        so new edge commits (and a reverse index appearing later) become
        visible without a server restart, while a handler that pinned a
        view keeps one consistent EdgeLake for its whole request."""
        if self._edges_path is None:
            return None
        toks = []
        for d in (self._edges_path, self._edges_path.rstrip("/") + "_rev"):
            try:
                st = os.stat(os.path.join(d, MANIFEST_NAME))
                toks.append((st.st_mtime_ns, st.st_size, st.st_ino))
            except FileNotFoundError:
                toks.append(None)
        token = tuple(toks)
        with self._elock:
            if token != self._etoken:
                if toks[0] is None:
                    # no edge lake YET (its first ingest hasn't landed):
                    # serve none, and NEVER create one here — LakeTable.open
                    # would write a default transcript-schema manifest that
                    # poisons the real edge pipeline's later ingest
                    self.edges = None
                else:
                    from .pipelines.graph_sink import EdgeLake

                    nb = Manifest.load(self._edges_path).num_buckets
                    self.edges = EdgeLake(
                        self._edges_path,
                        num_buckets=nb,
                        reverse_index=toks[1] is not None,
                    )
                self._etoken = token
            return self.edges

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "GraphServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "GraphServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()


def serve(
    lake_path: str,
    *,
    edges_path: str | None = None,
    host: str = "127.0.0.1",
    port: int = 8465,  # not 8265 — the Ray dashboard default
    transform_source: str | None = None,
) -> None:
    """Blocking entry point (the ``cli serve`` verb)."""
    s = GraphServer(
        lake_path,
        edges_path=edges_path,
        host=host,
        port=port,
        quiet=False,
        transform_source=transform_source,
    )
    print(f"serving {lake_path} on {s.url}")
    s.start()
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        s.close()
