"""O3 — status/health HTTP surface (WebController.java:25-84 parity).

Endpoints, same paths and JSON shapes as the reference's Spring
controller, served by a stdlib ``http.server`` on a daemon thread:

- ``GET /status``  → list of per-reader status objects
  (≙ ``ReaderStatus``: id / ok / status / readed / writed, plus this
  engine's richer counters from :meth:`CdcStreamEngine.status_dict`);
- ``GET /config``  → ``{"warnings": [...], "readers": [{id, changefeed,
  consumer}]}`` (≙ ``Config``/``ReaderInfo``, WebController.java:40-60 —
  the validation-warning view Application.java:95-97 feeds);
- ``POST /stop``   → graceful shutdown of every engine
  (≙ ``Application.stop``, WebController.java:25-28); GET on /stop is
  405, unknown paths 404;
- ``GET /`` (and ``/index.html``) → O4, the status web page
  (≙ static/index.html:16-70): per-reader table (changefeed, consumer,
  readed, writed, status) polling ``/status`` every second, config
  warnings, and a stop button POSTing ``/stop``.  Re-expressed
  dependency-free (vanilla ``fetch``; the reference pulls jQuery from a
  CDN) so it serves air-gapped.  Deep metrics stay in the Spark UI.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>CDC Processor Status</title>
<style>
 body { font-family: sans-serif; margin: 2em; }
 table { border-collapse: collapse; }
 td, th { border: 1px solid #999; padding: 4px 10px; }
 td.status.error { background: #fbb; }
 #warnings p { color: #a00; }
 button { margin-top: 1em; }
</style>
</head>
<body>
<h1>CDC Processor</h1>
<div id="warnings"></div>
<table>
 <thead><tr><th>changefeed</th><th>consumer</th><th>readed</th>
 <th>writed</th><th>status</th></tr></thead>
 <tbody id="status"></tbody>
</table>
<button id="stop">stop</button>
<script>
function esc(s) {
  const d = document.createElement('div');
  d.textContent = String(s); return d.innerHTML;
}
async function loadConfig() {
  const json = await (await fetch('config')).json();
  for (const w of (json.warnings || [])) {
    const p = document.createElement('p');
    p.textContent = w;
    document.getElementById('warnings').appendChild(p);
  }
  const tb = document.getElementById('status');
  for (const r of (json.readers || [])) {
    const tr = document.createElement('tr');
    tr.id = r.id;
    tr.innerHTML = '<td>' + esc(r.changefeed) + '</td><td>'
      + esc(r.consumer) + '</td><td class="readed"></td>'
      + '<td class="writed"></td><td class="status"></td>';
    tb.appendChild(tr);
  }
  updateStatus();
}
async function updateStatus() {
  const json = await (await fetch('status')).json();
  for (const r of json) {
    const row = document.getElementById(r.id);
    if (!row) continue;
    if (r.readed) row.querySelector('td.readed').textContent = r.readed;
    if (r.writed) row.querySelector('td.writed').textContent = r.writed;
    const s = row.querySelector('td.status');
    if (r.ok) { s.classList.remove('error'); s.textContent = 'OK'; }
    else { s.classList.add('error'); s.textContent = r.status; }
  }
  setTimeout(updateStatus, 1000);
}
document.getElementById('stop').onclick =
  () => fetch('stop', {method: 'POST'});
loadConfig();
</script>
</body>
</html>
"""


class StatusServer:
    """Serve /config, /status, POST /stop for a set of stream engines.

    ``engines`` is any iterable of objects with ``pipeline``,
    ``status_dict()`` and ``stop()`` — i.e.
    :class:`~ydb_cdc_processor_spark.streaming.engine.CdcStreamEngine`.
    ``port=0`` picks a free port (read it back from ``.port``).
    """

    def __init__(self, engines, warnings: list[str] | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.engines = list(engines)
        self.warnings = list(warnings or [])
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def _json(self, obj, code: int = 200) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path == "/status":
                    self._json([e.status_dict() for e in outer.engines])
                elif self.path == "/config":
                    self._json(outer.config_dict())
                elif self.path == "/stores":
                    # per-engine disk inventory (target + derived
                    # stores) — directory walks only, no Spark job
                    self._json([e.store_stats() for e in outer.engines
                                if hasattr(e, "store_stats")])
                elif self.path in ("/", "/index.html"):
                    body = INDEX_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/stop":
                    self._json({"error": "use POST"}, 405)
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self) -> None:  # noqa: N802
                if self.path == "/stop":
                    # stop AFTER responding would race the test client;
                    # engines' stop() is quick (quiesce trigger), so do it
                    # inline like the reference's blocking app.stop()
                    for e in outer.engines:
                        e.stop()
                    self._json({"stopped": True})
                else:
                    self._json({"error": "not found"}, 404)

            def log_message(self, *args) -> None:  # silence per-request noise
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- Config/ReaderInfo shape (WebController.java:40-60) ------------------

    def config_dict(self) -> dict:
        readers = []
        for e in self.engines:
            name = e.pipeline.name
            # pipeline names are "changefeed:consumer" (plans/config.py);
            # hand-built pipelines may have no ":" — consumer empty then
            changefeed, sep, consumer = name.rpartition(":")
            if not sep:
                changefeed, consumer = name, ""
            readers.append({"id": name,
                            "changefeed": changefeed,
                            "consumer": consumer})
        return {"warnings": self.warnings
                + [w for e in self.engines for w in e.pipeline.warnings],
                "readers": readers}

    # -- lifecycle -----------------------------------------------------------

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "StatusServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="cdc-status-http")
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
