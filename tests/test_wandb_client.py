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

    def do_PUT(self):
        # signed-URL file upload target (the PUT the SDK issues after
        # RunUploadUrls): /upload/<run>/<name>. Signed URLs carry no Basic
        # auth; the backend's uploadHeaders must ride along instead.
        parts = self.path.strip("/").split("/")
        if parts[0] != "upload" or len(parts) != 3:
            return self._reply(404, b"{}")
        if self.headers.get("X-Test-Store") != "yes":
            return self._reply(400, b"missing uploadHeaders")
        body = self.rfile.read(int(self.headers["Content-Length"]))
        self.server.uploaded.setdefault(parts[1], {})[parts[2]] = body
        self.server.upload_counts[(parts[1], parts[2])] = (
            self.server.upload_counts.get((parts[1], parts[2]), 0) + 1)
        return self._reply(200, b"{}")

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
        if "RunUploadUrls" in q:
            # registers names + returns signed PUT urls (the SDK's upload wire)
            host, port = self.server.server_address
            run = v["run"]
            urls = {n: f"http://{host}:{port}/upload/{run}/{n}"
                    for n in v["files"]}
            return self._reply(200, json.dumps({"data": {"model": {"bucket": {
                "id": "b1", "files": {
                    "uploadHeaders": ["X-Test-Store: yes"],
                    "edges": [{"node": {"name": n, "url": u}}
                              for n, u in urls.items()],
                }}}}}).encode())
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
    srv.uploaded = {}
    srv.upload_counts = {}
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


def test_upload_file_via_signed_urls(client, srv_obj, tmp_path):
    """The SDK's file-upload wire (wandb.save): RunUploadUrls resolves a
    signed PUT URL + storage headers, then the bytes PUT there — the
    mechanism the reference uses to push checkpoints to the cloud
    (wandb_callbacks.py:215-219)."""
    f = tmp_path / "last.ckpt"
    f.write_bytes(b"ckpt-bytes-1")
    out = client.upload_file(f"{ENTITY}/{PROJECT}/run1", str(f))
    assert out == {"name": "last.ckpt", "size": 12}
    assert srv_obj.uploaded["run1"]["last.ckpt"] == b"ckpt-bytes-1"
    # explicit name override
    client.upload_file(f"{ENTITY}/{PROJECT}/run1", str(f), name="epoch7.ckpt")
    assert srv_obj.uploaded["run1"]["epoch7.ckpt"] == b"ckpt-bytes-1"


def test_native_run_save_hash_dedup(client, srv_obj, tmp_path):
    """NativeWandbRun.save: re-saving unchanged bytes is a no-op (the
    reference's _hash_of_best_ckpts guard); changed bytes re-upload."""
    from spherical_dyffusion_tpu.utils.wandb_client import NativeWandbRun

    run = NativeWandbRun(ENTITY, PROJECT, "up1", client=client)
    f = tmp_path / "last.ckpt"
    f.write_bytes(b"v1")
    run.save(str(f))
    run.save(str(f))  # unchanged -> deduped
    assert srv_obj.upload_counts[("up1", "last.ckpt")] == 1
    f.write_bytes(b"v2")
    run.save(str(f))
    assert srv_obj.upload_counts[("up1", "last.ckpt")] == 2
    assert srv_obj.uploaded["up1"]["last.ckpt"] == b"v2"
    # best-effort: a dead endpoint must not raise (training survives)
    from spherical_dyffusion_tpu.utils.wandb_client import WandbClient

    run.client = WandbClient(base_url="http://127.0.0.1:9", api_key="x",
                             timeout=0.2)
    f.write_bytes(b"v3")
    run.save(str(f))  # swallowed


def test_native_run_log_code_snapshot(client, srv_obj, tmp_path):
    """log_code: a deterministic tar.gz of the source tree lands in the
    run's files (reference MyWandbLogger.log_code, wandb_callbacks.py:118-133)."""
    import io
    import tarfile

    from spherical_dyffusion_tpu.utils.code_snapshot import snapshot_code
    from spherical_dyffusion_tpu.utils.wandb_client import NativeWandbRun

    src = tmp_path / "pkg"
    (src / "sub").mkdir(parents=True)
    (src / "a.py").write_text("x = 1\n")
    (src / "sub" / "b.yaml").write_text("k: v\n")
    (src / "sub" / "data.bin").write_bytes(b"\x00")  # non-source: excluded
    (src / "__pycache__").mkdir()
    (src / "__pycache__" / "a.cpython-311.pyc").write_bytes(b"\x00")

    run = NativeWandbRun(ENTITY, PROJECT, "code1", client=client)
    run.log_code(str(src))
    blob = srv_obj.uploaded["code1"]["code.tar.gz"]
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tar:
        names = sorted(tar.getnames())
        assert names == ["pkg/a.py", "pkg/sub/b.yaml"]
        assert tar.extractfile("pkg/a.py").read() == b"x = 1\n"

    # determinism: identical trees -> byte-identical archives (so the save
    # dedup skips re-uploads across epochs)
    p1 = snapshot_code(str(tmp_path / "s1.tar.gz"), roots=[str(src)])
    p2 = snapshot_code(str(tmp_path / "s2.tar.gz"), roots=[str(src)])
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_trainer_save_to_wandb_and_watch_model(server, srv_obj, tmp_path,
                                               monkeypatch):
    """End-to-end: Trainer(save_to_wandb=True, watch_model=True) pushes
    last/best ckpts + the code snapshot into the wandb run's cloud files and
    logs per-subtree gradient norms (the reference's MyWandbLogger
    save-to-wandb + WatchModel legs, wandb_callbacks.py:22-33,74-140)."""
    from spherical_dyffusion_tpu.data import DebugDataModule
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        ExperimentConfig,
        InterpolationExperiment,
        Trainer,
        TrainerConfig,
    )
    from spherical_dyffusion_tpu.utils.loggers import WandbLogger

    monkeypatch.setenv("WANDB_BASE_URL", server)
    monkeypatch.setenv("WANDB_API_KEY", API_KEY)
    monkeypatch.setenv("WANDB_ENTITY", ENTITY)
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=3,
                         n_forcing=1, batch_size=4, n_timesteps=16)
    model = SFNO(SFNOConfig(img_shape=(8, 16), in_chans=5, out_chans=2,
                            embed_dim=8, num_layers=1, with_time_emb=True,
                            min_time=1, max_time=2))
    exp = InterpolationExperiment(model, ExperimentConfig(horizon=3),
                                  dm.in_packer, dm.out_packer, dm.normalizer)
    trainer = Trainer(exp, dm, TrainerConfig(
        epochs=2, steps_per_epoch=2, warmup_steps=1, use_ema=False,
        log_every=1, ckpt_dir=str(tmp_path), ckpt_monitor="val/mse",
        save_to_wandb=True, watch_model=True))
    vals = iter([1.0, 0.5])
    trainer.validate = lambda state: {"val/mse": next(vals)}
    lg = WandbLogger(project=PROJECT, name="trainrun1")
    trainer.fit(verbose=False, val_every=1, logger=lg)
    lg.finish()
    up = srv_obj.uploaded["trainrun1"]
    assert up["last.ckpt"] == (tmp_path / "last.ckpt").read_bytes()
    assert up["best.ckpt"] == (tmp_path / "best.ckpt").read_bytes()
    assert (tmp_path / "code.tar.gz").exists()
    assert up["code.tar.gz"] == (tmp_path / "code.tar.gz").read_bytes()
    # WatchModel analog: per-top-level-subtree gradient norms at log points
    rows = srv_obj.ingested["trainrun1"]
    sub_keys = {k for r in rows for k in r if k.startswith("train/grad_norm/")}
    assert sub_keys, f"no per-subtree grad norms in {sorted(rows[0])}"
    glob = [r["train/grad_norm"] for r in rows if "train/grad_norm" in r]
    assert glob and all(g > 0 for g in glob)


def test_trainer_watch_histograms(server, srv_obj, tmp_path, monkeypatch):
    """Round 5: the full WatchModel fidelity leg — watch_histograms=True
    emits per-subtree gradient-value histograms in the wandb wire format
    ({"_type": "histogram", "values": counts, "bins": edges}) through the
    native client's file_stream, intact (reference wandb.watch(log="all"),
    wandb_callbacks.py:22-33)."""
    from spherical_dyffusion_tpu.data import DebugDataModule
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        ExperimentConfig,
        InterpolationExperiment,
        Trainer,
        TrainerConfig,
    )
    from spherical_dyffusion_tpu.utils.loggers import WandbLogger

    monkeypatch.setenv("WANDB_BASE_URL", server)
    monkeypatch.setenv("WANDB_API_KEY", API_KEY)
    monkeypatch.setenv("WANDB_ENTITY", ENTITY)
    dm = DebugDataModule(channels=2, height=8, width=16, horizon=3,
                         n_forcing=1, batch_size=4, n_timesteps=16)
    model = SFNO(SFNOConfig(img_shape=(8, 16), in_chans=5, out_chans=2,
                            embed_dim=8, num_layers=1, with_time_emb=True,
                            min_time=1, max_time=2))
    exp = InterpolationExperiment(model, ExperimentConfig(horizon=3),
                                  dm.in_packer, dm.out_packer, dm.normalizer)
    trainer = Trainer(exp, dm, TrainerConfig(
        epochs=1, steps_per_epoch=2, warmup_steps=1, use_ema=False,
        log_every=1, watch_histograms=True, code_snapshot=False))
    lg = WandbLogger(project=PROJECT, name="histrun1")
    trainer.fit(verbose=False, val_every=10**9, logger=lg)
    lg.finish()
    rows = srv_obj.ingested["histrun1"]
    hists = {k: r[k] for r in rows for k in r if k.startswith("train/grad_hist/")}
    assert hists, f"no grad histograms in {sorted(rows[0])}"
    # count the subtree's parameters to check the histogram mass
    import jax
    import numpy as np

    params = trainer.state.params
    tree = params.get("params", params)
    for key, h in hists.items():
        assert h["_type"] == "histogram"
        assert len(h["values"]) == 64 and len(h["bins"]) == 65
        assert all(b2 >= b1 for b1, b2 in zip(h["bins"], h["bins"][1:]))
        sub = key.split("train/grad_hist/", 1)[1]
        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(tree[sub]))
        assert sum(h["values"]) == n, (key, sum(h["values"]), n)
