"""HTTP serving layer (serve.GraphServer): every endpoint must match the
library primitive it wraps (lookup/search_any/search_where/neighbors/
expand/head/changes_table), run with NO Ray session on the request path,
and speak the reference's resolver shapes (node / searchNodes / graph /
relationshipsByType / graphUpdates long-poll)."""

import json
import threading
import urllib.error
import urllib.request

import pytest
import ray.data as rd

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake
from sql_graph_visualizer_ray.serve import GraphServer
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get_err(url: str):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("http_serve")
    clog = materialize(
        "http_serve", ChangelogSpec(n_events=6000, n_convs=120, n_epochs=3, seed=5)
    )
    lake = LakeTable.open(str(root / "lake"), num_buckets=8)
    lake.apply(clog)

    edges = EdgeLake(str(root / "edges"), num_buckets=4, reverse_index=True)
    rows = [
        {"source_id": s, "target_id": t, "relation_type": "KNOWS",
         "direction": "outgoing"}
        for s in range(10)
        for t in ((s + 1) % 10, (s + 4) % 10)
    ]
    edges.ingest(rd.from_items(rows), epoch=0)

    with GraphServer(
        str(root / "lake"), edges_path=str(root / "edges")
    ) as srv:
        yield srv, lake, edges, clog


def test_config_and_graph(served):
    srv, lake, edges, _ = served
    st, cfg = _get(srv.url + "/config")
    assert st == 200
    assert cfg["version"] == lake.manifest.version
    assert cfg["applied_epoch"] == lake.manifest.applied_epoch
    assert cfg["has_edges"] is True
    assert "conv_id" in cfg["payload_schema"] or cfg["key_columns"]

    st, g = _get(srv.url + "/graph?limit=25")
    assert st == 200
    assert len(g["nodes"]) == 25
    assert len(g["relationships"]) == 20  # whole edge set fits the limit
    # bounded head == the first 25 rows of the full merged read
    want = lake.head(25).to_pylist()
    assert [r["conv_id"] for r in g["nodes"]] == [r["conv_id"] for r in want]


def test_node_endpoint_matches_lookup(served):
    srv, lake, _, _ = served
    conv = lake.final_table().column("conv_id")[0].as_py()
    st, out = _get(f"{srv.url}/node/{conv}")
    assert st == 200
    want = lake.lookup([conv]).to_pylist()
    assert len(out["rows"]) == len(want)
    assert [r["turn_idx"] for r in out["rows"]] == [r["turn_idx"] for r in want]
    assert [r["text"] for r in out["rows"]] == [r["text"] for r in want]

    st, err = _get_err(srv.url + "/node/no_such_conv_id_xyz")
    assert st == 404 and "no live rows" in err["error"]


def test_search_endpoints_match_primitives(served):
    srv, lake, _, _ = served
    # pick a term guaranteed to hit: a word from some stored text
    sample = lake.head(5).to_pylist()
    term = next(
        w for r in sample for w in (r["text"] or "").split() if len(w) >= 4
    )
    st, out = _get(f"{srv.url}/search?q={term}")
    want = lake.search_any(term)
    assert st == 200 and len(out["rows"]) == want.num_rows > 0

    st, out = _get(srv.url + "/where?col=role&op==&value=user")
    want = lake.search_where([("role", "=", "user")])
    assert st == 200 and len(out["rows"]) == want.num_rows > 0

    # conjunction via repeated triples
    st, out2 = _get(
        srv.url + "/where?col=role&op==&value=user&col=turn_idx&op=<&value=3"
    )
    want2 = lake.search_where([("role", "=", "user"), ("turn_idx", "<", 3)])
    assert st == 200 and len(out2["rows"]) == want2.num_rows > 0
    assert len(out2["rows"]) < len(out["rows"])

    # a TIMESTAMP predicate arrives as an ISO string over HTTP — search
    # parses it to the column type (Arrow has no equal(timestamp, string)
    # kernel; regression: this 500'd before the cast)
    ts = lake.head(1).to_pylist()[0]["ts"]
    st, out3 = _get(f"{srv.url}/where?col=ts&op===&value={ts.isoformat()}")
    want3 = lake.search_where([("ts", "==", ts)])
    assert st == 200 and len(out3["rows"]) == want3.num_rows > 0
    # the direct API accepts the ISO string too now (same parse)
    assert lake.search_where([("ts", "==", ts.isoformat())]).equals(want3)
    # garbage timestamp strings are a client error, not a server crash
    st, err = _get_err(f"{srv.url}/where?col=ts&op===&value=not-a-time")
    assert st == 400 and "error" in err


def test_edge_endpoints_match_primitives(served):
    srv, _, edges, _ = served
    st, out = _get(srv.url + "/neighbors/3?direction=both")
    want = edges.neighbors(3, direction="both").to_pylist()
    assert st == 200
    assert [(r["source_id"], r["target_id"]) for r in out["rows"]] == [
        (r["source_id"], r["target_id"]) for r in want
    ]

    st, out = _get(srv.url + "/expand?seeds=0&hops=2&direction=out")
    want = edges.expand([0], hops=2, direction="out").to_pylist()
    assert st == 200 and len(out["rows"]) == len(want)

    st, out = _get(srv.url + "/relationships?type=KNOWS")
    assert st == 200 and len(out["rows"]) == 20
    st, out = _get(srv.url + "/relationships?type=NOPE")
    assert st == 200 and out["rows"] == []


def test_updates_long_poll(served, tmp_path):
    srv, lake, _, clog = served
    # from the beginning: first data commit
    st, first = _get(srv.url + "/updates?after=-1")
    assert st == 200 and first["rows"] and first["version"] >= 0
    want = lake.changes_table(first["version"])
    assert len(first["rows"]) == want.num_rows

    # at the head: empty poll returns immediately with the same cursor
    head = lake.manifest.version
    st, out = _get(f"{srv.url}/updates?after={head}&wait=0.2")
    assert st == 200 and out["rows"] == [] and out["cursor"] == head

    # long-poll actually waits for a commit that lands mid-flight
    result = {}

    def poll():
        result["r"] = _get(f"{srv.url}/updates?after={head}&wait=20")

    th = threading.Thread(target=poll)
    th.start()
    import pyarrow as pa

    writer = LakeTable.open(lake.path)
    sch = writer.manifest.payload_schema
    ev = pa.table(
        {
            "lsn": pa.array([10**12], pa.int64()),
            "op": ["I"],
            "conv_id": pa.array(["zzz_new_conv"]).cast(sch.field("conv_id").type),
            "turn_idx": pa.array([0]).cast(sch.field("turn_idx").type),
            "role": ["user"],
            "text": ["hello from the long poll test"],
            "tool": pa.array([None], sch.field("tool").type),
            "ts": pa.array([10**15], pa.timestamp("us")),
        }
    )
    writer.apply_dataset(
        rd.from_arrow(ev), epoch=writer.manifest.applied_epoch + 1
    )
    th.join(timeout=30)
    assert not th.is_alive()
    st, upd = result["r"]
    assert st == 200 and upd["cursor"] > head and upd["rows"]


def test_bad_requests(served):
    srv = served[0]
    st, err = _get_err(srv.url + "/where?col=role")  # missing op/value
    assert st == 400
    st, err = _get_err(srv.url + "/graph?limit=0")
    assert st == 400
    st, err = _get_err(srv.url + "/nope")
    assert st == 404
    st, err = _get_err(srv.url + "/where?col=not_a_column&op==&value=1")
    assert st == 400 and "not_a_column" in err["error"]


def test_metrics_endpoint(served):
    """/metrics: per-route counts + latency quantiles over a bounded
    window plus the lake's lineage counters — the engine-side analogue of
    the reference's realtime performance monitor (K6/A4)."""
    srv, lake, _, _ = served
    # generate some traffic on two routes
    some = lake.head(1).to_pylist()[0]["conv_id"]
    for _ in range(5):
        _get(f"{srv.url}/node/{some}")
    _get(srv.url + "/config")

    st, m = _get(srv.url + "/metrics")
    assert st == 200
    node = m["routes"]["/node"]
    assert node["count"] >= 5 and node["window"] >= 5
    assert 0 <= node["p50_ms"] <= node["p95_ms"] <= node["max_ms"]
    assert m["routes"]["/config"]["count"] >= 1
    assert m["lake"]["counters"]["raw_events"] > 0
    assert m["lake"]["data_files"] > 0
    # errors are counted too (the finally-block records every dispatch) —
    # but unknown paths are CLAMPED to one shared "/_other" slot so a
    # scanner cannot grow server memory one route entry per random URL.
    # delta-based: other tests in this module share the server
    before = m["routes"].get("/_other", {}).get("count", 0)
    for i in range(5):
        _get_err(f"{srv.url}/nope_{i}")
    st, m2 = _get(srv.url + "/metrics")
    assert m2["routes"]["/_other"]["count"] == before + 5
    assert not any(r.startswith("/nope") for r in m2["routes"])


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_graphql_endpoint(served):
    """POST /graphql speaks the reference's Query root
    (schema.graphqls:36-53): graph / node(id) / searchNodes(query) /
    relationshipsByType(type) / nodesByType(type) / config, with Node and
    Relationship in the schema's wire shape ({id,label,properties} /
    {from,to,type,properties}, properties = JSON string)."""
    srv, lake, edges, _ = served
    lake.reload()  # an earlier test commits via a second writer instance
    conv = lake.final_table().column("conv_id")[0].as_py()

    st, out = _post(srv.url + "/graphql", {"query": "{ graph { nodes relationships } }"})
    assert st == 200 and "errors" not in out
    g = out["data"]["graph"]
    assert g["nodes"] and g["relationships"]
    n0 = g["nodes"][0]
    assert set(n0) == {"id", "label", "properties"}
    assert json.loads(n0["properties"])["conv_id"]
    r0 = g["relationships"][0]
    assert set(r0) == {"from", "to", "type", "properties"}

    # node(id) via a variable, plus an alias
    st, out = _post(
        srv.url + "/graphql",
        {
            "query": 'query N($id: ID!) { me: node(id: $id) { id label } }',
            "variables": {"id": conv},
        },
    )
    assert st == 200
    me = out["data"]["me"]
    assert me["id"].startswith(f"{conv}:")
    want = lake.lookup([conv]).to_pylist()[0]
    assert json.loads(me["properties"])["text"] == want["text"]

    # searchNodes matches search_any; nodesByType matches search(role=)
    sample = lake.head(5).to_pylist()
    term = next(
        w for r in sample for w in (r["text"] or "").split() if len(w) >= 4
    )
    st, out = _post(
        srv.url + "/graphql", {"query": f'{{ searchNodes(query: "{term}") }}'}
    )
    assert st == 200
    assert len(out["data"]["searchNodes"]) == lake.search_any(term).num_rows > 0

    st, out = _post(
        srv.url + "/graphql", {"query": '{ nodesByType(type: "user") }'}
    )
    assert len(out["data"]["nodesByType"]) == (
        lake.search_where([("role", "=", "user")]).num_rows
    )
    assert all(n["label"] == "user" for n in out["data"]["nodesByType"])

    st, out = _post(
        srv.url + "/graphql",
        {"query": '{ relationshipsByType(type: "KNOWS") config { neo4j } }'},
    )
    rels = out["data"]["relationshipsByType"]
    assert len(rels) == 20 and rels[0]["type"] == "KNOWS"
    assert out["data"]["config"]["neo4j"]["uri"].startswith("lake://")

    # per-field execution errors are GraphQL-shaped, not transport errors
    st, out = _post(
        srv.url + "/graphql", {"query": '{ node(id: "missing_xyz") nope }'}
    )
    assert st == 200
    assert out["data"]["node"] is None  # no live rows -> null node
    assert out["data"]["nope"] is None
    assert any("nope" in e["path"] for e in out["errors"])

    # malformed query / unsupported operation -> 400
    st, out = _post(srv.url + "/graphql", {"query": "{ graph"})
    assert st == 400 and out["errors"]
    # mutation parses now; unconfigured transform is a field-level error
    st, out = _post(srv.url + "/graphql", {"query": "mutation { transformData }"})
    assert st == 200 and out["data"]["transformData"] is None
    assert "no transform source" in out["errors"][0]["message"]
    st, out = _post(srv.url + "/graphql", {"query": "subscription { graphUpdates }"})
    assert st == 400 and "/updates" in out["errors"][0]["message"]
    st, out = _post(srv.url + "/graphql", {"nope": 1})
    assert st == 400

    # /graphql shows up in /metrics like every other route
    st, mt = _get(srv.url + "/metrics")
    assert mt["routes"]["/graphql"]["count"] >= 7


def test_numeric_looking_string_keys(ray_session, tmp_path):
    """Round-5 review findings: a STRING key column whose values look
    numeric ("00012") must stay reachable — /node must not int-fold the
    id, /where must compare the raw string, and GraphQL ``node(id: 12)``
    must answer GraphQL-shaped JSON (the old eager int-cast raised
    pa.ArrowTypeError out of the handler and dropped the connection)."""
    import pyarrow as pa

    lake = LakeTable.open(str(tmp_path / "numlake"), num_buckets=4)
    sch = lake.manifest.payload_schema
    ev = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": ["I", "I"],
            "conv_id": pa.array(["00012", "7"]).cast(sch.field("conv_id").type),
            "turn_idx": pa.array([0, 0]).cast(sch.field("turn_idx").type),
            "role": ["user", "user"],
            "text": ["padded id", "short id"],
            "tool": pa.array([None, None], sch.field("tool").type),
            "ts": pa.array([10**12, 10**12 + 1], pa.timestamp("us")),
        }
    )
    lake.apply_dataset(rd.from_arrow(ev), epoch=0)
    with GraphServer(str(tmp_path / "numlake")) as srv:
        st, out = _get(srv.url + "/node/00012")
        assert st == 200 and out["rows"][0]["text"] == "padded id"
        st, out = _get(srv.url + "/node/7")
        assert st == 200 and out["rows"][0]["text"] == "short id"
        # /where compares the raw STRING "00012", not int 12
        st, out = _get(srv.url + "/where?col=conv_id&op==&value=00012")
        assert st == 200 and len(out["rows"]) == 1
        assert out["rows"][0]["conv_id"] == "00012"
        # a non-numeric value against an int column is a clean 400
        st, err = _get_err(srv.url + "/where?col=turn_idx&op==&value=abc")
        assert st == 400 and "abc" in err["error"]
        # GraphQL int-literal id: string key keeps str(12) = "12" -> no
        # row -> null node, a valid GraphQL answer (never a dropped
        # connection / unhandled ArrowTypeError)
        st, out = _post(srv.url + "/graphql", {"query": "{ node(id: 12) }"})
        assert st == 200 and out["data"]["node"] is None
        st, out = _post(
            srv.url + "/graphql", {"query": '{ node(id: "00012") }'}
        )
        assert st == 200 and out["data"]["node"]["id"].startswith("00012:")


def test_lake_view_snapshot_semantics(served):
    """lake_view(): unchanged manifest -> the SAME pinned object (stat
    fast-path: no JSON re-parse on the 10 Hz long-poll loop); a new commit
    -> a NEW readonly view, while previously pinned views keep serving
    their own version (handlers can never mix two manifest versions in
    one request)."""
    import pyarrow as pa

    srv, lake, _, _ = served
    v1 = srv.lake_view()
    assert srv.lake_view() is v1  # token unchanged: fast path
    ver = v1.manifest.version

    writer = LakeTable.open(lake.path)
    sch = writer.manifest.payload_schema
    ev = pa.table(
        {
            "lsn": pa.array([10**13], pa.int64()),
            "op": ["I"],
            "conv_id": pa.array(["view_semantics_conv"]).cast(
                sch.field("conv_id").type
            ),
            "turn_idx": pa.array([0]).cast(sch.field("turn_idx").type),
            "role": ["user"],
            "text": ["lake view pin test"],
            "tool": pa.array([None], sch.field("tool").type),
            "ts": pa.array([2 * 10**15], pa.timestamp("us")),
        }
    )
    writer.apply_dataset(
        rd.from_arrow(ev), epoch=writer.manifest.applied_epoch + 1
    )

    v2 = srv.lake_view()
    assert v2 is not v1 and v2.manifest.version > ver
    assert v1.manifest.version == ver  # the pinned view was never mutated
    assert v2.readonly  # serving views cannot commit
    # and the HTTP surface sees the new row through the refreshed view
    st, out = _get(srv.url + "/node/view_semantics_conv")
    assert st == 200 and out["rows"][0]["text"] == "lake view pin test"


def test_edges_view_refresh(served):
    """Edge commits after server start become visible without a restart:
    edges_view() stat-guards the forward+reverse manifests exactly like
    lake_view(), so /relationships serves the new epoch's edges."""
    srv, _, edges, _ = served
    st, out = _get(srv.url + "/relationships?type=LIKES")
    assert st == 200 and out["rows"] == []

    rows = [
        {"source_id": 100 + i, "target_id": 200 + i,
         "relation_type": "LIKES", "direction": "outgoing"}
        for i in range(4)
    ]
    edges.ingest(rd.from_items(rows), epoch=edges.manifest.applied_epoch + 1)

    st, out = _get(srv.url + "/relationships?type=LIKES")
    assert st == 200 and len(out["rows"]) == 4
    # and the refreshed reverse index serves incoming neighbors for them
    st, out = _get(srv.url + "/neighbors/203?direction=in")
    assert st == 200 and [r["source_id"] for r in out["rows"]] == [103]


def test_server_never_creates_lakes(ray_session, tmp_path):
    """A mistyped lake path is a loud error, not a silently-created empty
    default-schema lake the server then serves zeros from."""
    with pytest.raises(LookupError, match="MANIFEST"):
        GraphServer(str(tmp_path / "nope"))
    assert not (tmp_path / "nope").exists()


def test_edges_path_created_after_server_start(ray_session, tmp_path):
    """edges_path pointing at a NOT-YET-CREATED edge lake serves none —
    and must not create a default transcript-schema manifest there, which
    would poison the edge pipeline's later first ingest. Once the real
    EdgeLake ingests, the same server serves it without a restart."""
    import pyarrow as pa

    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=2)
    empty = rd.from_arrow(
        pa.table(
            {
                "lsn": pa.array([1], pa.int64()),
                "op": pa.array(["I"], pa.string()),
                "conv_id": pa.array(["c0"], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
    )
    lake.apply_dataset(empty, epoch=0)
    edges_dir = str(tmp_path / "edges")
    with GraphServer(str(tmp_path / "lake"), edges_path=edges_dir) as srv:
        code, out = _get_err(srv.url + "/relationships?type=KNOWS")
        assert code == 404 and "no edge lake" in out["error"]
        # crucially: nothing was created at the edges path
        assert not (tmp_path / "edges").exists()
        edges = EdgeLake(edges_dir, num_buckets=2, reverse_index=True)
        edges.ingest(
            rd.from_items(
                [{"source_id": 1, "target_id": 2,
                  "relation_type": "KNOWS", "direction": "outgoing"}]
            ),
            epoch=0,
        )
        st, out = _get(srv.url + "/relationships?type=KNOWS")
        assert st == 200 and len(out["rows"]) == 1
        # the edge lake's REAL schema survived: keyed by edge ids, not the
        # transcript default
        assert "source_id" in out["rows"][0]


def test_viz_page_and_api_graph(served):
    """The reference's visualization surface (viz server on :3000,
    cmd/main.go:350-470): GET / serves the interactive page, GET
    /api/graph exports the {nodes:[{id,label,properties}],
    relationships:[{from,to,type,properties}]} wire shape."""
    srv, lake, edges, _ = served
    with urllib.request.urlopen(srv.url + "/", timeout=30) as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        html = r.read().decode()
    # the page carries its renderer inline (no CDN) and hits the feed
    assert 'id="viz"' in html and "/api/graph" in html
    assert 'id="search"' in html  # the reference page's node search box
    assert "<script" in html and "cdn" not in html.lower()

    st, g = _get(srv.url + "/api/graph?limit=30")
    assert st == 200
    assert set(g) == {"nodes", "relationships"}
    key0 = lake.manifest.key_columns[0]
    assert all(set(n) == {"id", "label", "properties"} for n in g["nodes"])
    # one node per top-level key, id = str(key), turns folded as n_rows
    head = lake.head(30).to_pylist()
    want_ids = list(dict.fromkeys(str(r[key0]) for r in head))
    assert [n["id"] for n in g["nodes"]] == want_ids
    assert all(n["properties"]["n_rows"] >= 1 for n in g["nodes"])
    # relationships come from the edge lake verbatim
    assert all(
        set(r) == {"from", "to", "type", "properties"}
        for r in g["relationships"]
    )
    # module fixture is shared: other tests may have ingested more edges,
    # so bound rather than pin (base fixture = 20, limit = 30)
    assert 20 <= len(g["relationships"]) <= 30
    assert any(r["type"] == "KNOWS" for r in g["relationships"])


def test_health_and_performance_dashboard(served):
    """GET /api/health (reference cmd/main.go:249-288) and GET /performance
    (the dashboard page, cmd/main.go:440-443) — fed by /monitor, /metrics
    and the /benchmarks REST routes."""
    srv, lake, _, _ = served
    st, h = _get(srv.url + "/api/health")
    assert st == 200 and h["status"] == "healthy"
    assert h["lake"].startswith("connected")
    assert h["edges"] == "attached"
    assert h["uptime_s"] >= 0

    with urllib.request.urlopen(srv.url + "/performance", timeout=30) as r:
        html = r.read().decode()
        assert "text/html" in r.headers["Content-Type"]
    for hook in ("qpsMetric", "alertPanel", "topQueriesList",
                 "startBenchmark", "/monitor", "/metrics", "/benchmarks"):
        assert hook in html
    assert "cdn" not in html.lower()


def test_benchmark_rest_lifecycle(served):
    """POST /benchmarks starts a bounded serving-probe run; GET polls it to
    completion; the concurrency cap returns 409; cancel works. (The
    reference dashboard ships these buttons with the backend marked TODO —
    here the registry is real.)"""
    srv, lake, _, _ = served
    import time as _time

    def post(path, body=None):
        req = urllib.request.Request(
            srv.url + path,
            data=json.dumps(body or {}).encode(),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    st, out = post("/benchmarks", {"duration_s": 0.4})
    assert st == 202 and out["status"] == "pending"
    rid = out["id"]

    # a second start while one runs hits the concurrency cap
    st2, out2 = post("/benchmarks", {"duration_s": 5.0})
    assert st2 == 409 and "concurrent" in out2["error"]

    deadline = _time.time() + 30
    while _time.time() < deadline:
        st, r = _get(f"{srv.url}/benchmarks/{rid}")
        if r["status"] not in ("pending", "running"):
            break
        _time.sleep(0.1)
    assert r["status"] == "completed"
    assert r["metrics"]["total_queries"] > 0
    assert r["metrics"]["errors"] == 0

    # listing shows the run; an unknown id is a 404 (resource not found)
    st, ls = _get(srv.url + "/benchmarks")
    assert any(x["id"] == rid for x in ls["runs"])
    st, err = _get_err(srv.url + "/benchmarks/nope")
    assert st == 404 and "not found" in err["error"]

    # cancel path: start a long run, stop it
    st, out = post("/benchmarks", {"duration_s": 30.0})
    assert st == 202
    st, c = post(f"/benchmarks/{out['id']}/cancel")
    assert st == 200 and c["cancelled"]
    deadline = _time.time() + 30
    while _time.time() < deadline:
        _, r = _get(f"{srv.url}/benchmarks/{out['id']}")
        if r["status"] not in ("pending", "running"):
            break
        _time.sleep(0.1)
    assert r["status"] == "cancelled"
    st, c = post("/benchmarks/nope/cancel")
    assert st == 404


def test_graphql_transform_data_mutation(ray_session, tmp_path_factory):
    """mutation { transformData } actually runs the ingest (the reference's
    resolver is a return-true stub, schema.resolvers.go:17-22): a server
    configured with a transform source replays the pending epochs in a
    detached child, visible through the ordinary commit machinery."""
    import time as _time

    root = tmp_path_factory.mktemp("gql_transform")
    clog = materialize(
        "gql_transform",
        ChangelogSpec(n_events=1500, n_convs=30, n_epochs=3, seed=21),
    )
    lake = LakeTable.open(str(root / "lake"), num_buckets=4)
    lake.apply(clog, max_epochs=1)  # epochs 1..2 left for the mutation

    def post(url, body):
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())

    with GraphServer(
        str(root / "lake"), transform_source=clog
    ) as srv:
        st, out = post(
            srv.url + "/graphql", {"query": "mutation { transformData }"}
        )
        assert st == 200 and out["data"]["transformData"] is True
        assert "errors" not in out
        # the child owns its own Ray session; wait for its commit
        deadline = _time.time() + 180
        while _time.time() < deadline:
            lake.reload()
            if lake.manifest.applied_epoch == 2:
                break
            _time.sleep(1.0)
        assert lake.manifest.applied_epoch == 2, "transform child never landed"
        # epoch fencing makes re-triggering safe: still applied_epoch == 2
        st, out = post(
            srv.url + "/graphql", {"query": "mutation { transformData }"}
        )
        assert out["data"]["transformData"] is True


def test_serve_during_ingest_compact_vacuum(ray_session, tmp_path_factory):
    """Serving stays fully available while the maintenance loop runs ON the
    same lake: epoch ingest, compaction, and retention-window vacuum all
    land mid-hammer, and not one request fails. The retention window is the
    load-bearing piece — each request pins the manifest version it opened,
    and ``vacuum(min_age_s=W)`` guarantees the pinned version's files
    outlive the request (aggressive ``vacuum()`` would yank de-referenced
    dirs out from under in-flight reads; test_time_travel pins that
    counterfactual at the library level)."""
    from sql_graph_visualizer_ray.state.manifest import vacuum

    root = tmp_path_factory.mktemp("serve_maint")
    clog = materialize(
        "serve_maint",
        ChangelogSpec(n_events=8000, n_convs=150, n_epochs=4, seed=7),
    )
    lake = LakeTable.open(str(root / "lake"), num_buckets=8)
    assert lake.apply(clog, max_epochs=1)["epochs"] == 1

    keys = [
        r["conv_id"] for r in lake.head(8, columns=["conv_id"]).to_pylist()
    ]
    failures: list[str] = []
    per_thread_versions: list[list[int]] = [[] for _ in range(3)]
    stop = threading.Event()

    def hammer(url: str, slot: list[int]):
        i = 0
        while not stop.is_set():
            k = keys[i % len(keys)]
            i += 1
            try:
                st, out = _get(f"{url}/node/{k}")
                if st != 200 or not out["rows"]:
                    failures.append(f"node {k}: {st} {out}")
                st, cfg = _get(url + "/config")
                if st != 200:
                    failures.append(f"config: {st}")
                slot.append(cfg["version"])
            except Exception as e:  # noqa: BLE001 — record, don't die
                failures.append(repr(e))

    with GraphServer(str(root / "lake")) as srv:
        threads = [
            threading.Thread(target=hammer, args=(srv.url, slot), daemon=True)
            for slot in per_thread_versions
        ]
        for t in threads:
            t.start()
        # the maintenance loop a production lake runs: ingest the remaining
        # epochs one commit at a time, compacting + vacuuming between them
        while lake.apply(clog, max_epochs=1)["epochs"]:
            lake.compact()
            vacuum(lake.path, lake.manifest, min_age_s=3600.0)
        stop.set()
        for t in threads:
            t.join(timeout=30)
        # the server converges on the head version once maintenance settles
        st, cfg = _get(srv.url + "/config")
        assert st == 200 and cfg["version"] == lake.manifest.version

    assert not failures, failures[:5]
    for slot in per_thread_versions:
        assert slot, "hammer thread made no requests"
        # each client observes committed versions monotonically (no request
        # ever reads a torn or rolled-back manifest)
        assert slot == sorted(slot)


def test_benchmarks_on_empty_lake_is_409(ray_session, tmp_path_factory):
    """An empty lake has no probe keys: POST /benchmarks must answer 409
    with the availability error, not drop the connection."""
    import pyarrow as pa

    root = tmp_path_factory.mktemp("empty_bench")
    lake = LakeTable.open(str(root / "lake"), num_buckets=2)
    empty = rd.from_arrow(
        pa.table(
            {
                "lsn": pa.array([], pa.int64()),
                "op": pa.array([], pa.string()),
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    )
    lake.apply_dataset(empty, epoch=0)
    with GraphServer(str(root / "lake")) as srv:
        req = urllib.request.Request(
            srv.url + "/benchmarks", data=b"{}", method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                st, out = r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            st, out = e.code, json.loads(e.read())
        assert st == 409 and "not available" in out["error"]
