"""Offline tests for the native wandb cloud client (utils/wandb_client.py)
against a loopback GraphQL server — exercises the reference's wandb_api
surface (src/utilities/wandb_api.py: filtered run queries, config reload,
ckpt-name selection, cloud checkpoint restore) with zero network egress,
the same pattern as tests/test_s3.py for the native S3 client."""

import base64
import http.server
import json
import threading

import pytest

from spherical_dyffusion_tpu.utils.wandb_client import (
    WandbClient,
    get_wandb_ckpt_name,
    load_config_from_wandb,
    restore_checkpoint_from_wandb,
)

API_KEY = "local-test-key"
ENTITY, PROJECT = "climate", "spherical-dyffusion"

CKPT_BYTES = b"\x93checkpoint-payload" * 64

RUNS = {
    "run1": {
        "id": "UnVuOnYx", "name": "run1", "displayName": "sfno-d0.35",
        "state": "finished",
        # the SDK envelope carries desc alongside value — unwrap must key on
        # 'value' presence, not dict equality
        "config": {"_wandb": {"value": {"cli": "x"}},
                   "model": {"value": {"embed_dim": 256, "num_layers": 8}},
                   "lr": {"value": 3e-4, "desc": None}},
        "summaryMetrics": {"val/avg/crps": 0.3369, "epoch": 49},
        "files": [{"name": "best.ckpt", "md5": "x", "sizeBytes": len(CKPT_BYTES)},
                  {"name": "last.ckpt", "md5": "y", "sizeBytes": len(CKPT_BYTES)}],
        "history": [json.dumps({"_step": i, "loss": 1.0 / (i + 1)})
                    for i in range(5)],
    },
    "run2": {
        "id": "UnVuOnYy", "name": "run2", "displayName": "sfno-d0.5",
        "state": "running",
        "config": {"lr": {"value": 1e-4}},
        "summaryMetrics": {"val/avg/crps": 0.41},
        "files": [{"name": "epoch023.ckpt", "md5": "a", "sizeBytes": 4},
                  {"name": "epoch047.ckpt", "md5": "b", "sizeBytes": 4}],
        "history": [],
    },
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, code, body, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authed(self):
        auth = self.headers.get("Authorization", "")
        want = "Basic " + base64.b64encode(f"api:{API_KEY}".encode()).decode()
        return auth == want

    def do_GET(self):
        if not self._authed():
            return self._reply(401, b"{}")
        # direct file download URLs: /files/<run>/<name>
        parts = self.path.strip("/").split("/")
        if parts[0] == "files" and len(parts) == 3 and parts[1] in RUNS:
            if any(f["name"] == parts[2] for f in RUNS[parts[1]]["files"]):
                return self._reply(200, CKPT_BYTES, "application/octet-stream")
        return self._reply(404, b"{}")

    def do_POST(self):
        if not self._authed():
            return self._reply(
                200, json.dumps({"errors": [{"message": "unauthorized"}]}).encode())
        # file-stream ingestion: POST /files/<entity>/<project>/<run>/file_stream
        parts = self.path.strip("/").split("/")
        if parts[0] == "files" and parts[-1] == "file_stream" and len(parts) == 5:
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            if body.get("complete"):
                self.server.finished[parts[3]] = body.get("exitcode")
                return self._reply(200, b"{}")
            hist = body["files"]["wandb-history.jsonl"]
            store = self.server.ingested.setdefault(parts[3], [])
            assert hist["offset"] == len(store), (hist["offset"], len(store))
            store.extend(json.loads(line) for line in hist["content"])
            return self._reply(200, b"{}")
        if self.path != "/graphql":
            return self._reply(404, b"{}")
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        q, v = body["query"], body.get("variables", {})
        if "UpsertBucket" in q:
            self.server.upserted.setdefault(v["name"], []).append(
                json.loads(v.get("config") or "{}"))
            return self._reply(200, json.dumps({"data": {"upsertBucket": {
                "bucket": {"id": "xyz", "name": v["name"],
                           "displayName": v.get("displayName")}}}}).encode())
        if v.get("project") != PROJECT or v.get("entity") != ENTITY:
            return self._reply(200, json.dumps({"data": {"project": None}}).encode())

        def node(run, with_files=False):
            n = {k: run[k] for k in ("id", "name", "displayName", "state")}
            n["config"] = json.dumps(run["config"])
            n["summaryMetrics"] = json.dumps(run["summaryMetrics"])
            if with_files:
                names = v.get("names")
                files = [dict(f, directUrl=(
                    f"http://{self.server.server_address[0]}:"
                    f"{self.server.server_address[1]}/files/{run['name']}/{f['name']}"))
                    for f in run["files"]
                    if names is None or f["name"] in names]
                n["files"] = {"edges": [{"node": f} for f in files]}
            return n

        if "RunHistory" in q:
            run = RUNS.get(v.get("name"))
            data = {"project": {"run": {"history": run["history"]} if run else None}}
        elif "RunFiles" in q:
            run = RUNS.get(v.get("name"))
            data = {"project": {"run": node(run, with_files=True) if run else None}}
        elif "query Runs" in q:
            runs = list(RUNS.values())
            filt = json.loads(v["filters"]) if v.get("filters") else {}
            for cond in filt.get("$and", [filt] if filt else []):
                for key, want in cond.items():
                    if key == "state":
                        runs = [r for r in runs if r["state"] == want]
                    elif key.startswith("config."):
                        ckey = key.split(".", 1)[1].removesuffix(".value")
                        runs = [r for r in runs
                                if r["config"].get(ckey, {}).get("value") == want]
            first = v.get("first") or len(runs)
            data = {"project": {"runs": {
                "edges": [{"node": node(r)} for r in runs[:first]]}}}
        else:  # single Run
            run = RUNS.get(v.get("name"))
            data = {"project": {"run": node(run) if run else None}}
        return self._reply(200, json.dumps({"data": data}).encode())


@pytest.fixture(scope="module")
def srv_obj():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.ingested = {}
    srv.upserted = {}
    srv.finished = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def server(srv_obj):
    return f"http://127.0.0.1:{srv_obj.server_address[1]}"


@pytest.fixture()
def client(server):
    return WandbClient(base_url=server, api_key=API_KEY)


def test_run_query_decodes_json_string_payloads(client):
    run = client.run(f"{ENTITY}/{PROJECT}/run1")
    assert run["displayName"] == "sfno-d0.35"
    assert run["config"]["model"]["value"]["embed_dim"] == 256
    assert run["summaryMetrics"]["val/avg/crps"] == pytest.approx(0.3369)


def test_runs_filters_mongodb_style(client):
    """The reference queries project runs with MongoDB-style filters
    (wandb_api.py:85-150); state and config filters are applied server-side."""
    all_runs = client.runs(ENTITY, PROJECT)
    assert {r["name"] for r in all_runs} == {"run1", "run2"}
    done = client.runs(ENTITY, PROJECT, filters={"$and": [{"state": "finished"}]})
    assert [r["name"] for r in done] == ["run1"]
    lr = client.runs(ENTITY, PROJECT,
                     filters={"config.lr.value": 1e-4})
    assert [r["name"] for r in lr] == ["run2"]


def test_history_rows(client):
    rows = client.history(f"{ENTITY}/{PROJECT}/run1")
    assert len(rows) == 5 and rows[0]["loss"] == 1.0


def test_ckpt_name_selection_ladder(client):
    """best/last prefer literal filenames; epoch parsing as fallback
    (reference get_wandb_ckpt_name, wandb_api.py:198-244)."""
    rp1, rp2 = f"{ENTITY}/{PROJECT}/run1", f"{ENTITY}/{PROJECT}/run2"
    assert get_wandb_ckpt_name(client, rp1, "best") == "best.ckpt"
    assert get_wandb_ckpt_name(client, rp1, "last") == "last.ckpt"
    assert get_wandb_ckpt_name(client, rp2, "last") == "epoch047.ckpt"
    assert get_wandb_ckpt_name(client, rp2, 23) == "epoch023.ckpt"
    with pytest.raises(ValueError):
        get_wandb_ckpt_name(client, rp2, "best")
    with pytest.raises(ValueError):
        get_wandb_ckpt_name(client, rp2, 99)


def test_restore_checkpoint_downloads_and_prefixes(client, tmp_path):
    """Cloud restore: resolve name, download via directUrl, prefix the local
    file with the run id (restore_model_from_wandb_cloud, wandb_api.py:246-311)."""
    p = restore_checkpoint_from_wandb(f"{ENTITY}/{PROJECT}/run1",
                                      dest_dir=str(tmp_path), client=client)
    assert p.endswith("run1-best.ckpt")
    assert open(p, "rb").read() == CKPT_BYTES
    # idempotent: second call reuses the local file
    assert restore_checkpoint_from_wandb(f"{ENTITY}/{PROJECT}/run1",
                                         dest_dir=str(tmp_path),
                                         client=client) == p


def test_load_config_unwraps_value_envelopes(client):
    cfg = load_config_from_wandb(f"{ENTITY}/{PROJECT}/run1", client=client,
                                 overrides={"model": {"num_layers": 2}})
    assert "_wandb" not in cfg
    assert cfg["lr"] == pytest.approx(3e-4)
    assert cfg["model"]["num_layers"] == 2          # override applied
    assert cfg["model"]["embed_dim"] == 256         # cloud value survives


def test_auth_is_required(server):
    bad = WandbClient(base_url=server, api_key="wrong")
    with pytest.raises(RuntimeError, match="unauthorized"):
        bad.run(f"{ENTITY}/{PROJECT}/run1")


def test_native_run_ingestion(client, srv_obj):
    """The write half of the protocol: upsertBucket at init, buffered metric
    rows through the file-stream endpoint with monotone offsets (the SDK's
    wire format for wandb.log)."""
    from spherical_dyffusion_tpu.utils.wandb_client import NativeWandbRun

    run = NativeWandbRun(ENTITY, PROJECT, "ingest1", client=client,
                         config={"embed_dim": 64}, flush_every=3)
    assert srv_obj.upserted["ingest1"][0]["embed_dim"] == {"value": 64}
    for i in range(7):
        run.log({"loss": 1.0 / (i + 1)}, step=i)
    run.finish()
    rows = srv_obj.ingested["ingest1"]
    assert len(rows) == 7
    assert rows[3]["_step"] == 3 and rows[3]["loss"] == pytest.approx(0.25)
    # finish() marks the run complete server-side (the SDK's final POST)
    assert srv_obj.finished["ingest1"] == 0


def test_native_run_survives_transport_failures(client, srv_obj):
    """Post-init transport failures must never propagate into training: the
    mirror degrades to best-effort and disables itself after repeated
    failures."""
    from spherical_dyffusion_tpu.utils.wandb_client import (
        NativeWandbRun,
        WandbClient,
    )

    run = NativeWandbRun(ENTITY, PROJECT, "flaky1", client=client,
                         flush_every=2)
    # break the endpoint mid-run
    run.client = WandbClient(base_url="http://127.0.0.1:9", api_key="x",
                             timeout=0.2)
    for i in range(NativeWandbRun.MAX_FAILURES + 3):
        run.log({"loss": 1.0}, step=i)  # flushes raise inside, are swallowed
    run.update_config({"a": 1})
    run.finish()  # no exception
    assert run._failures >= NativeWandbRun.MAX_FAILURES


def test_epoch_parse_ignores_numeric_suffixes(client, srv_obj, monkeypatch):
    """'epoch004-v1.ckpt' is epoch 4, not 41 (the reference parses only the
    digits after 'epoch')."""
    RUNS["run3"] = dict(RUNS["run2"],
                        files=[{"name": "epoch004-v1.ckpt", "md5": "a",
                                "sizeBytes": 4},
                               {"name": "epoch005.ckpt", "md5": "b",
                                "sizeBytes": 4}])
    try:
        rp = f"{ENTITY}/{PROJECT}/run3"
        assert get_wandb_ckpt_name(client, rp, 4) == "epoch004-v1.ckpt"
        assert get_wandb_ckpt_name(client, rp, "last") == "epoch005.ckpt"
    finally:
        del RUNS["run3"]


def test_wandb_logger_native_mirror(server, srv_obj, monkeypatch):
    """WandbLogger falls back to the native-protocol run when the SDK is
    absent and WANDB_BASE_URL is set (this env has no wandb package, so the
    fallback engages for real)."""
    from spherical_dyffusion_tpu.utils.loggers import WandbLogger

    monkeypatch.setenv("WANDB_BASE_URL", server)
    monkeypatch.setenv("WANDB_API_KEY", API_KEY)
    monkeypatch.setenv("WANDB_ENTITY", ENTITY)
    lg = WandbLogger(project=PROJECT, name="mirror1")
    lg.log_hyperparams({"lr": 0.001})
    lg.log({"train/loss": 0.5}, step=0)
    lg.log({"train/loss": 0.25}, step=1)
    lg.finish()
    assert srv_obj.upserted["mirror1"][-1]["lr"] == {"value": 0.001}
    rows = srv_obj.ingested["mirror1"]
    assert [r["train/loss"] for r in rows] == [0.5, 0.25]


def test_wandb_prefix_resolves_through_checkpoint_path(client, tmp_path,
                                                       monkeypatch, server):
    """`wandb:ENTITY/PROJECT/RUN[:best|last]` resolves through the standard
    checkpoint path machinery (utils/checkpointing.py), like `hf:`."""
    from spherical_dyffusion_tpu.utils.checkpointing import resolve_checkpoint_path

    monkeypatch.setenv("WANDB_BASE_URL", server)
    monkeypatch.setenv("WANDB_API_KEY", API_KEY)
    p = resolve_checkpoint_path(f"wandb:{ENTITY}/{PROJECT}/run1:last",
                                cache_dir=str(tmp_path))
    assert p.endswith("run1-last.ckpt")
    assert open(p, "rb").read() == CKPT_BYTES
