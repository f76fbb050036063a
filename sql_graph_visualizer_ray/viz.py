"""Graph visualization page + its JSON feed — the reference's namesake
surface.

The reference runs a dedicated visualization server on :3000
(``/root/reference/cmd/main.go:350-470``): ``GET /`` serves
``internal/interfaces/web/templates/visualization.html`` (a vis-network
page with a node search box) and ``GET /api/graph`` exports the whole
graph as ``{"nodes": [{id, label, properties}], "relationships":
[{from, to, type, properties}]}`` (``cmd/main.go:393-430``).

Here both mount on the existing ``GraphServer`` (no second port needed):

- ``graph_payload()`` produces the reference's exact ``/api/graph`` wire
  shape from the lake (one node per top-level key, its first live row as
  properties) and the edge lake (relationships verbatim). Bounded by
  ``limit`` — the viz is a window onto the lake, never a full export (the
  reference materializes the entire graph per request, which is exactly
  the full-refresh habit this engine drops).
- ``VIZ_HTML`` replaces the CDN-loaded vis-network + Bootstrap page with a
  fully inline, dependency-free force-directed SVG renderer (this sandbox
  — and any airgapped deploy — has no CDN), keeping the reference page's
  interactions: node search with a result dropdown, click for the
  property panel, and click-to-expand via ``/neighbors`` when an edge
  lake is attached.
"""

from __future__ import annotations

import json
from typing import Any

__all__ = ["graph_payload", "VIZ_HTML", "DASHBOARD_HTML"]


def graph_payload(lake, edges, limit: int = 100) -> dict:
    """The reference's ``/api/graph`` response (``cmd/main.go:393-430``):
    nodes carry ``{id, label, properties}``, relationships
    ``{from, to, type, properties}``. Node identity is the FIRST key
    column (conversation level — turns fold into the node's property
    bag as ``n_rows``), which is also the edge lake's key space, so
    relationship endpoints join onto node ids."""
    from .serve import _json_default

    key0 = lake.manifest.key_columns[0]
    rows = lake.head(limit).to_pylist()
    nodes: dict[str, dict[str, Any]] = {}
    for row in rows:
        nid = str(row[key0])
        hit = nodes.get(nid)
        if hit is None:
            nodes[nid] = {
                "id": nid,
                "label": nid,
                "properties": dict(row, n_rows=1),
            }
        else:
            hit["properties"]["n_rows"] += 1
    rels = []
    if edges is not None:
        for row in edges.lake.head(limit).to_pylist():
            rels.append(
                {
                    "from": str(row["source_id"]),
                    "to": str(row["target_id"]),
                    "type": row.get("relation_type", ""),
                    "properties": row,
                }
            )
    out = {"nodes": list(nodes.values()), "relationships": rels}
    # round-trip through the serving JSON encoder so timestamps/bytes in
    # property bags serialize exactly like every other endpoint
    return json.loads(json.dumps(out, default=_json_default))


# The page mirrors internal/interfaces/web/templates/visualization.html
# (search box + #viz canvas + physics layout) without its CDN dependencies.
VIZ_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="UTF-8">
<title>Graph Visualization</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#fafafa}
 .controls{display:flex;gap:8px;align-items:center;padding:10px;
   background:#f0f1f3;border-bottom:1px solid #ddd}
 .controls input{padding:6px 10px;border:1px solid #bbb;border-radius:4px}
 #viz{width:100vw;height:calc(100vh - 54px);display:block}
 #panel{position:fixed;right:12px;top:64px;width:320px;max-height:70vh;
   overflow:auto;background:#fff;border:1px solid #ccc;border-radius:6px;
   padding:10px;font-size:12px;display:none;box-shadow:0 2px 8px #0002}
 #results{position:absolute;top:44px;left:10px;background:#fff;
   border:1px solid #ddd;border-radius:4px;max-height:220px;overflow:auto;
   display:none;z-index:10;box-shadow:0 2px 8px #0002}
 #results div{padding:6px 12px;cursor:pointer;border-bottom:1px solid #eee}
 #results div:hover{background:#f3f4f6}
 text{font-size:10px;fill:#333;pointer-events:none}
 circle{cursor:pointer}
 .edge{stroke:#9aa4b2;stroke-width:1;opacity:.7}
 #status{color:#666;font-size:12px;margin-left:auto;padding-right:12px}
</style>
</head>
<body>
<div class="controls">
  <input id="search" placeholder="Search node..." size="28">
  <input id="limit" type="number" value="100" min="1" max="1000" size="6">
  <button id="reload">Reload</button>
  <span id="status"></span>
  <div id="results"></div>
</div>
<svg id="viz"></svg>
<div id="panel"></div>
<script>
"use strict";
const svg = document.getElementById("viz"), SVGNS = "http://www.w3.org/2000/svg";
let nodes = [], edges = [], byId = new Map(), timer = null;

async function jget(url){ const r = await fetch(url); if(!r.ok) throw new Error(await r.text()); return r.json(); }

function addNode(n){
  if(byId.has(n.id)) return byId.get(n.id);
  const W = svg.clientWidth || 900, H = svg.clientHeight || 600;
  // deterministic-ish initial spread off the id hash
  let h = 0; for(const c of n.id) h = (h*31 + c.charCodeAt(0)) >>> 0;
  const o = {id:n.id, label:n.label||n.id, props:n.properties||{},
             x: 60 + (h % 997)/997*(W-120), y: 60 + ((h>>10) % 991)/991*(H-120),
             vx:0, vy:0};
  byId.set(n.id, o); nodes.push(o); return o;
}
function addEdge(r){
  // endpoints outside the node window get synthesized placeholder nodes
  const a = byId.get(r.from) || addNode({id:r.from, label:r.from, properties:{}});
  const b = byId.get(r.to)   || addNode({id:r.to,   label:r.to,   properties:{}});
  edges.push({a, b, type:r.type||""});
}

function step(){
  const W = svg.clientWidth || 900, H = svg.clientHeight || 600;
  for(let i=0;i<nodes.length;i++) for(let j=i+1;j<nodes.length;j++){
    const p=nodes[i], q=nodes[j];
    let dx=p.x-q.x, dy=p.y-q.y, d2=dx*dx+dy*dy+0.01, f=1800/d2;
    if(f>4) f=4;
    p.vx+=dx*f; p.vy+=dy*f; q.vx-=dx*f; q.vy-=dy*f;
  }
  for(const e of edges){
    let dx=e.b.x-e.a.x, dy=e.b.y-e.a.y, d=Math.sqrt(dx*dx+dy*dy)+0.01;
    const f=(d-90)*0.01;
    e.a.vx+=dx/d*f*d; e.a.vy+=dy/d*f*d; e.b.vx-=dx/d*f*d; e.b.vy-=dy/d*f*d;
  }
  for(const n of nodes){
    n.vx+=(W/2-n.x)*0.002; n.vy+=(H/2-n.y)*0.002;  // gravity
    n.x+=Math.max(-8,Math.min(8,n.vx*0.08)); n.y+=Math.max(-8,Math.min(8,n.vy*0.08));
    n.vx*=0.55; n.vy*=0.55;
    n.x=Math.max(12,Math.min(W-12,n.x)); n.y=Math.max(12,Math.min(H-12,n.y));
  }
}

function render(){
  svg.replaceChildren();
  for(const e of edges){
    const l=document.createElementNS(SVGNS,"line");
    l.setAttribute("class","edge");
    l.setAttribute("x1",e.a.x); l.setAttribute("y1",e.a.y);
    l.setAttribute("x2",e.b.x); l.setAttribute("y2",e.b.y);
    svg.appendChild(l);
  }
  for(const n of nodes){
    const c=document.createElementNS(SVGNS,"circle");
    c.setAttribute("cx",n.x); c.setAttribute("cy",n.y); c.setAttribute("r",7);
    c.setAttribute("fill", n.highlight ? "#e4572e" : "#4a7dbd");
    c.addEventListener("click", ()=>select(n));
    svg.appendChild(c);
    const t=document.createElementNS(SVGNS,"text");
    t.setAttribute("x",n.x+9); t.setAttribute("y",n.y+3);
    t.textContent=n.label.length>18?n.label.slice(0,17)+"\\u2026":n.label;
    svg.appendChild(t);
  }
}

function run(iters){
  if(timer) clearInterval(timer);
  let k=0;
  timer=setInterval(()=>{ step(); render(); if(++k>=iters) clearInterval(timer); }, 30);
}

async function select(n){
  n.highlight = true;
  const panel=document.getElementById("panel");
  panel.style.display="block";
  // build with createElement/textContent, never innerHTML: node ids and
  // properties are LAKE DATA — markup in a text column must render inert,
  // not execute in the viewer's browser (stored XSS)
  panel.replaceChildren();
  const b=document.createElement("b"); b.textContent=n.id;
  const pre=document.createElement("pre");
  pre.textContent=JSON.stringify(n.props,null,1);
  const i=document.createElement("i"); i.textContent="expanding\\u2026";
  panel.append(b, pre, i);
  try{  // click-to-expand via /neighbors when an edge lake is attached
    const nb = await jget("/neighbors/"+encodeURIComponent(n.id));
    const rows = nb.outgoing ? nb.outgoing.concat(nb.incoming||[]) : (nb.rows||[]);
    for(const r of rows) addEdge({from:String(r.source_id), to:String(r.target_id),
                                  type:r.relation_type});
    panel.querySelector("i").textContent = rows.length+" neighbor edges";
    run(60);
  }catch(e){ panel.querySelector("i").textContent = "no edge lake / no neighbors"; }
}

async function load(){
  const lim=document.getElementById("limit").value;
  const g=await jget("/api/graph?limit="+lim);
  nodes=[]; edges=[]; byId=new Map();
  for(const n of g.nodes) addNode(n);
  for(const r of g.relationships) addEdge(r);
  document.getElementById("status").textContent =
    nodes.length+" nodes \\u00b7 "+edges.length+" relationships";
  run(120);
}

document.getElementById("reload").addEventListener("click", load);
document.getElementById("search").addEventListener("keydown", async ev=>{
  if(ev.key!=="Enter") return;
  const term=ev.target.value.trim(); if(!term) return;
  const res=document.getElementById("results");
  try{
    const out=await jget("/search?q="+encodeURIComponent(term)+"&limit=20");
    res.replaceChildren();
    for(const row of out.rows){
      const d=document.createElement("div");
      const id=String(Object.values(row)[0]);
      d.textContent=id+" \\u2014 "+JSON.stringify(row).slice(0,60);
      d.addEventListener("click", ()=>{
        res.style.display="none";
        const n=byId.get(id)||addNode({id:id,label:id,properties:row});
        select(n); run(60);
      });
      res.appendChild(d);
    }
    res.style.display=out.rows.length?"block":"none";
  }catch(e){  // loud serving errors (too-broad term) surface to the user
    res.replaceChildren();
    const d=document.createElement("div");
    d.textContent=String(e.message||e).slice(0,160);
    res.appendChild(d); res.style.display="block";
  }
});
load();
</script>
</body>
</html>
"""


# The dashboard mirrors internal/interfaces/web/templates/
# performance_dashboard.html (metric tiles, alert panel, trends chart, top
# queries list, benchmark start/stop) fed by polling /monitor + /metrics +
# /benchmarks instead of the reference's WebSocket push — and its benchmark
# buttons actually run (the reference ships the buttons with the backend
# tools marked TODO, cmd/main.go:671-673).
DASHBOARD_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="UTF-8">
<title>Performance Dashboard</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#222}
 header{padding:12px 18px;background:#1d2733;color:#fff;display:flex;
   align-items:center;gap:12px}
 #connectionStatus{width:10px;height:10px;border-radius:50%;background:#888}
 #connectionStatus.ok{background:#3fb950}
 #connectionStatus.bad{background:#e5534b}
 .tiles{display:grid;grid-template-columns:repeat(auto-fit,minmax(170px,1fr));
   gap:10px;padding:14px 18px}
 .tile{background:#fff;border:1px solid #e1e4e8;border-radius:8px;
   padding:12px 14px}
 .tile .v{font-size:22px;font-weight:600}
 .tile .l{font-size:11px;color:#667;text-transform:uppercase}
 section{margin:0 18px 14px;background:#fff;border:1px solid #e1e4e8;
   border-radius:8px;padding:12px 14px}
 h2{font-size:13px;margin:0 0 8px;color:#334}
 table{width:100%;border-collapse:collapse;font-size:12px}
 th,td{text-align:left;padding:4px 8px;border-bottom:1px solid #eef}
 #alertPanel div{background:#fff3f2;border:1px solid #f0b5b1;border-radius:6px;
   padding:6px 10px;margin:4px 0;font-size:12px}
 #alertPanel .critical{background:#ffe0de;border-color:#e5534b}
 button{padding:6px 12px;border:1px solid #99a;border-radius:5px;
   background:#fff;cursor:pointer}
 #spark{width:100%;height:70px}
 #benchmarkResults{font-size:12px;margin-top:8px;white-space:pre}
</style>
</head>
<body>
<header>
  <div id="connectionStatus"></div>
  <b>Performance Dashboard</b>
  <span id="systemStatusText" style="font-size:12px;color:#cdd">-</span>
</header>
<div class="tiles">
  <div class="tile"><div class="v" id="qpsMetric">-</div><div class="l">events / s (ingest)</div></div>
  <div class="tile"><div class="v" id="latencyMetric">-</div><div class="l">busiest route p95 ms</div></div>
  <div class="tile"><div class="v" id="lagMetric">-</div><div class="l">commit lag s</div></div>
  <div class="tile"><div class="v" id="rowsMetric">-</div><div class="l">live rows</div></div>
  <div class="tile"><div class="v" id="deltaMetric">-</div><div class="l">max delta files</div></div>
  <div class="tile"><div class="v" id="skewMetric">-</div><div class="l">bucket skew</div></div>
</div>
<section><h2>Ingest trend (events/s per poll)</h2><svg id="spark"></svg></section>
<section><h2>Alerts</h2><div id="alertPanel">none</div></section>
<section><h2>Top routes by p95</h2>
  <table id="topQueriesList"><tr><th>route</th><th>count</th><th>p50 ms</th>
  <th>p95 ms</th><th>max ms</th></tr></table></section>
<section><h2>Benchmark (serving probe)</h2>
  <button id="startBenchmark">Start</button>
  <button id="stopBenchmark" disabled>Stop</button>
  <span id="benchmarkStatus" style="font-size:12px;margin-left:8px">idle</span>
  <div id="benchmarkResults"></div></section>
<script>
"use strict";
const hist = [];
let benchId = null, pollTimer = null;
async function jget(u){ const r = await fetch(u); if(!r.ok) throw new Error(await r.text()); return r.json(); }
function set(id, v){ document.getElementById(id).textContent = v; }

function spark(){
  const svg = document.getElementById("spark");
  svg.replaceChildren();
  if(hist.length < 2) return;
  const W = svg.clientWidth || 800, H = 70, max = Math.max(...hist, 1);
  const pts = hist.map((v,i)=>((i/(hist.length-1))*(W-8)+4)+","+(H-6-(v/max)*(H-14)));
  const p = document.createElementNS("http://www.w3.org/2000/svg","polyline");
  p.setAttribute("points", pts.join(" "));
  p.setAttribute("fill","none"); p.setAttribute("stroke","#4a7dbd");
  p.setAttribute("stroke-width","2");
  svg.appendChild(p);
}

async function refresh(){
  const dot = document.getElementById("connectionStatus");
  try{
    const [mon, met, health] = await Promise.all(
      [jget("/monitor"), jget("/metrics"), jget("/api/health")]);
    dot.className = "ok";
    set("systemStatusText", health.status + " \\u00b7 lake " + health.lake +
        " \\u00b7 up " + Math.round(health.uptime_s) + "s");
    set("qpsMetric", mon.events_per_sec.toLocaleString());
    set("lagMetric", mon.commit_lag_s == null ? "-" : mon.commit_lag_s.toFixed(1));
    set("rowsMetric", mon.live_rows.toLocaleString());
    set("deltaMetric", mon.max_delta_files);
    set("skewMetric", mon.bucket_skew.toFixed(2));
    hist.push(mon.events_per_sec); if(hist.length > 60) hist.shift();
    spark();
    const routes = Object.entries(met.routes||{})
      .sort((a,b)=>b[1].p95_ms-a[1].p95_ms);
    set("latencyMetric", routes.length ? routes[0][1].p95_ms.toFixed(1) : "-");
    const tbl = document.getElementById("topQueriesList");
    while(tbl.rows.length > 1) tbl.deleteRow(1);
    for(const [r,s] of routes.slice(0,10)){
      const tr = tbl.insertRow();
      for(const v of [r, s.count, s.p50_ms, s.p95_ms, s.max_ms])
        tr.insertCell().textContent = v;
    }
    const panel = document.getElementById("alertPanel");
    panel.replaceChildren();
    if(!mon.alerts.length) panel.textContent = "none";
    for(const a of mon.alerts){
      const d = document.createElement("div");
      d.className = a.severity;
      d.textContent = "["+a.severity+"] "+a.title+" \\u2014 "+a.description;
      panel.appendChild(d);
    }
  }catch(e){ dot.className = "bad"; set("systemStatusText", String(e.message||e).slice(0,80)); }
}

async function pollBench(){
  if(!benchId) return;
  try{
    const r = await jget("/benchmarks/" + benchId);
    set("benchmarkStatus", r.status);
    if(r.status === "completed" && r.metrics){
      document.getElementById("benchmarkResults").textContent =
        "qps "+r.metrics.queries_per_second+"  queries "+r.metrics.total_queries+
        "  avg "+r.metrics.avg_latency_ms+"ms  p95 "+r.metrics.p95_latency_ms+
        "ms  max "+r.metrics.max_latency_ms+"ms  errors "+r.metrics.errors;
    }
    if(r.status !== "pending" && r.status !== "running"){
      benchId = null;
      document.getElementById("startBenchmark").disabled = false;
      document.getElementById("stopBenchmark").disabled = true;
      return;
    }
  }catch(e){ set("benchmarkStatus", String(e.message||e).slice(0,60)); }
  setTimeout(pollBench, 700);
}

document.getElementById("startBenchmark").addEventListener("click", async ()=>{
  try{
    const r = await fetch("/benchmarks", {method:"POST",
      body: JSON.stringify({duration_s: 3.0})});
    const out = await r.json();
    if(!r.ok) throw new Error(out.error);
    benchId = out.id;
    document.getElementById("startBenchmark").disabled = true;
    document.getElementById("stopBenchmark").disabled = false;
    set("benchmarkStatus", out.status);
    pollBench();
  }catch(e){ set("benchmarkStatus", String(e.message||e).slice(0,60)); }
});
document.getElementById("stopBenchmark").addEventListener("click", async ()=>{
  if(benchId) await fetch("/benchmarks/"+benchId+"/cancel", {method:"POST"});
});

refresh();
pollTimer = setInterval(refresh, 2000);
</script>
</body>
</html>
"""
