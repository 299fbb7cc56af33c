"""train.py CLI, dataset_tool, and misc-utility tests."""
import json
import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def run_cli(*argv, timeout=600):
    return subprocess.run([sys.executable, *argv], cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=timeout)


def _make_dataset_zip(path, n=16, res=8, labels=True):
    from PIL import Image
    import io

    rng = np.random.default_rng(0)
    labs = []
    with zipfile.ZipFile(path, "w") as zf:
        for i in range(n):
            img = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            name = f"img{i:08d}.png"
            zf.writestr(name, buf.getvalue())
            labs.append([name, int(rng.integers(0, 4))])
        if labels:
            zf.writestr("dataset.json", json.dumps({"labels": labs}))


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    data = str(tmp_path / "data.zip")
    _make_dataset_zip(data)
    outdir = str(tmp_path / "runs")
    r = run_cli(
        "train.py", "--outdir", outdir, "--data", data, "--cond", "1",
        "--arch", "ddpmpp", "--precond", "edm", "--batch", "16",
        "--batch-gpu", "8", "--cbase", "16", "--cres", "1,2",
        "--duration", "0.001", "--tick", "1", "--snap", "1",
        "--augment", "0.5", "--seed", "0", "--max-ticks", "1",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    runs = os.listdir(outdir)
    assert len(runs) == 1
    run_dir = os.path.join(outdir, runs[0])
    assert os.path.exists(os.path.join(run_dir, "training_options.json"))
    assert os.path.exists(os.path.join(run_dir, "stats.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "log.txt"))
    stats = [json.loads(l) for l in open(os.path.join(run_dir, "stats.jsonl"))]
    assert "Loss/loss" in stats[0]


@pytest.mark.slow
def test_train_cli_dry_run(tmp_path):
    data = str(tmp_path / "data.zip")
    _make_dataset_zip(data)
    r = run_cli("train.py", "--outdir", str(tmp_path), "--data", data, "-n",
                "--cbase", "16", "--cres", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--dry-run: exiting" in r.stdout


def test_dataset_tool_roundtrip(tmp_path):
    import dataset_tool

    src = str(tmp_path / "src")
    os.makedirs(os.path.join(src, "cats"))
    os.makedirs(os.path.join(src, "dogs"))
    from PIL import Image

    rng = np.random.default_rng(0)
    for d in ("cats", "dogs"):
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)).save(
                os.path.join(src, d, f"{i}.png")
            )
    dest = str(tmp_path / "out.zip")
    n = dataset_tool.convert(src, dest, resolution="8x8")
    assert n == 6
    from diffusion_tts_tpu.training.dataset import ImageDataset

    ds = ImageDataset(path=dest)
    assert len(ds) == 6 and ds.image_shape == (8, 8, 3) and ds.label_dim == 2


def test_misc_utils(capsys):
    import jax.numpy as jnp

    from diffusion_tts_tpu.utils import misc

    misc.assert_shape(jnp.zeros((2, 3)), (2, None))
    with pytest.raises(AssertionError):
        misc.assert_shape(jnp.zeros((2, 3)), (3, None))

    tree = {"a": {"kernel": jnp.zeros((2, 3))}, "b": {"bias": jnp.zeros((3,))}}
    total = misc.print_module_summary(tree)
    assert total == 9
    assert "Total" in capsys.readouterr().out

    dst = {"a": {"kernel": jnp.ones((2, 3))}, "b": {"bias": jnp.ones((3,))}}
    out = misc.copy_params_and_buffers({"a": {"kernel": jnp.zeros((2, 3))}}, dst)
    assert float(out["a"]["kernel"].sum()) == 0 and float(out["b"]["bias"].sum()) == 3
    with pytest.raises(KeyError):
        misc.copy_params_and_buffers({"a": {}}, dst, require_all=True)

    @misc.profiled_function
    def f(x):
        return x + 1

    assert int(f(jnp.asarray(1))) == 2

    with pytest.raises(FileNotFoundError):
        misc.open_file_or_url("https://example.com/nope.pkl")


class TestLMDB:
    """Pure-Python LMDB round-trip (reference edm/dataset_tool.py:113-139;
    the lmdb package is not a baked dependency, so reader and fixture writer
    are both built-in — utils/lmdb_io.py)."""

    def test_roundtrip_small_values(self, tmp_path):
        from diffusion_tts_tpu.utils.lmdb_io import iterate_lmdb, lmdb_entries, write_lmdb

        items = [(f"k{i:04d}".encode(), bytes([i % 256]) * (10 + i)) for i in range(20)]
        db = write_lmdb(str(tmp_path / "db"), items)
        assert lmdb_entries(db) == 20
        out = list(iterate_lmdb(db))
        assert out == sorted(items)

    def test_roundtrip_overflow_and_multileaf(self, tmp_path):
        """Values larger than half a page go to overflow page runs; enough
        entries to force multiple leaves and a branch root."""
        import numpy as np

        from diffusion_tts_tpu.utils.lmdb_io import iterate_lmdb, write_lmdb

        rng = np.random.default_rng(0)
        items = []
        for i in range(40):
            size = 5000 if i % 7 == 0 else 150  # mix overflow + inline
            items.append((f"key{i:05d}".encode(), rng.integers(0, 256, size).astype("uint8").tobytes()))
        db = write_lmdb(str(tmp_path / "db2"), items)
        out = list(iterate_lmdb(db))
        assert out == sorted(items)

    def test_dataset_tool_converts_lmdb(self, tmp_path):
        """LMDB of encoded PNGs -> training zip (the reference pipeline)."""
        import io
        import zipfile

        import numpy as np
        from PIL import Image

        from diffusion_tts_tpu.utils.lmdb_io import write_lmdb
        import dataset_tool

        rng = np.random.default_rng(1)
        items = []
        for i in range(4):
            img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            items.append((f"{i:08d}".encode(), buf.getvalue()))
        db = write_lmdb(str(tmp_path / "imgdb"), items)
        dest = str(tmp_path / "out.zip")
        n = dataset_tool.convert(db, dest, resolution="8x8")
        assert n == 4
        with zipfile.ZipFile(dest) as zf:
            pngs = [p for p in zf.namelist() if p.endswith(".png")]
            assert len(pngs) == 4
            with zf.open(pngs[0]) as f:
                assert np.asarray(Image.open(f)).shape == (8, 8, 3)


class TestBenchToolSmokes:
    """The perf/reward tooling must stay runnable: every tool has a tiny
    CPU mode exercised here end-to-end via its real CLI."""

    @pytest.mark.slow
    def test_train_bench_tiny(self):
        r = run_cli("tools/train_bench.py", "--arch", "tiny", "--batch", "4",
                    "--steps", "1")
        assert r.returncode == 0, r.stderr[-800:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["arch"] == "tiny" and np.isfinite(out["loss"])

    @pytest.mark.slow
    def test_train_bench_tiny_unroll_rounds(self):
        r = run_cli("tools/train_bench.py", "--arch", "tiny", "--batch", "4",
                    "--rounds", "2", "--steps", "1", "--unroll")
        assert r.returncode == 0, r.stderr[-800:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["batch"] == 8  # rounds x micro

    @pytest.mark.slow  # ~17 s subprocess compile; the e2e bench smoke below
    # exercises the same pipeline surface
    def test_sd_bench_tiny(self):
        r = run_cli("tools/sd_bench.py", "--tiny", "--iters", "1")
        assert r.returncode == 0, r.stderr[-800:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["unit"] == "NFE/s" and out["value"] > 0

    @pytest.mark.slow
    def test_sd_e2e_bench_tiny(self):
        r = run_cli("tools/sd_e2e_bench.py", "--tiny", "--steps", "2",
                    "--K", "1", "--N", "2", "--repeat", "1")
        assert r.returncode == 0, r.stderr[-2000:]
        d = json.loads(r.stdout.strip().splitlines()[-1])
        assert d["value"] > 0 and d["nfe"] == 2 * (1 + 1 * 2 * 2)

    @pytest.mark.slow
    def test_sd_reward_bench_tiny(self, tmp_path):
        dest = str(tmp_path / "rewards.json")
        r = run_cli("tools/sd_reward_bench.py", "--tiny", "--steps", "2",
                    "--seeds", "0,1", "--methods", "naive,eps_greedy",
                    "--json", dest)
        assert r.returncode == 0, r.stderr[-2000:]
        with open(dest) as f:
            d = json.load(f)
        rows = {row["method"]: row for row in d["rows"]}
        assert set(rows) == {"naive", "eps_greedy"}
        assert len(rows["naive"]["per_seed"]) == 2
        assert rows["eps_greedy"]["nfe_per_sample"] == 2 * (1 + 5 * 4)
        assert "RANDOM-INIT" in d["weights"]

    @pytest.mark.slow
    def test_conv_bwd_probe_tiny(self, tmp_path):
        dest = str(tmp_path / "probe.json")
        r = run_cli("tools/conv_bwd_probe.py", "--tiny", "--iters", "2",
                    "--reps", "1", "--json", dest)
        assert r.returncode == 0, r.stderr[-2000:]
        with open(dest) as f:
            d = json.load(f)
        row = d["rows"][0]
        assert row["fwd_xla_s"] > 0 and row["dgrad_xla_s"] > 0
        assert row["wgrad_xla_s"] > 0

    @pytest.mark.slow
    def test_reward_curve_quick(self, tmp_path):
        dest = str(tmp_path / "curve.json")
        r = run_cli("tools/reward_curve.py", "--arch", "tiny", "--quick",
                    "--seeds", "0,1", "--steps", "3", "--json", dest)
        assert r.returncode == 0, r.stderr[-800:]
        data = json.loads(open(dest).read())
        assert {row["method"] for row in data["rows"]} == {"eps_greedy", "rejection"}
        assert "RANDOM-INIT" in data["weights"]

    @pytest.mark.slow
    def test_perf_probe_tiny(self):
        r = run_cli("tools/perf_probe.py", "--tiny", "--batches", "1",
                    "--inner", "1", "--reps", "1")
        assert r.returncode == 0, r.stderr[-800:]
        rows = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
        assert any("pct_sol" in row for row in rows)

    @pytest.mark.slow
    def test_mcts_compile_probe_tiny(self):
        r = run_cli("tools/mcts_compile_probe.py", "--arch", "tiny", "--steps",
                    "3", "--S", "2", "--run")
        assert r.returncode == 0, r.stderr[-800:]
        assert "run_s=" in r.stdout


class TestDriverEntryPoints:
    """The two driver artifacts — bench.py and __graft_entry__.entry() —
    must stay runnable: the round harness invokes them headlessly and a
    breakage surfaces only after the round ends."""

    @pytest.mark.slow
    def test_bench_cpu_smoke(self):
        r = run_cli("bench.py")
        assert r.returncode == 0, r.stderr[-2000:]
        line = r.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        assert d["unit"] == "NFE/s" and d["value"] > 0
        assert "vs_baseline" in d and "metric" in d

    @pytest.mark.slow
    def test_graft_entry_forward(self):
        r = run_cli("-c",
                    "import jax, __graft_entry__ as g;"
                    "fn, args = g.entry();"
                    "out = jax.jit(fn)(*args);"
                    "print('OK', out.shape)")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "OK" in r.stdout
