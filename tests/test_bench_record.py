"""bench.py must assemble and print a record even when every leg is
skipped/failed — partial evidence beats none (a relay death inside one
leg may not erase the others)."""
import json
import sys


def test_bench_assembles_partial_record(monkeypatch, capsys):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "_probe_device", lambda: None)
    for var in ("QA", "STOM", "TRAIN", "SAM2"):
        monkeypatch.setenv(f"RGA3_BENCH_SKIP_{var}", "1")
    appended = {}
    monkeypatch.setattr(
        bench, "_append_history", lambda rec: appended.update(rec)
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "sam2_hiera_l_1024_memory_tracking_throughput"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["extra"]["sam2_error"].startswith("skipped")
    assert rec["extra"]["videoinfer_qa"]["error"].startswith("skipped")
    assert appended["metric"] == rec["metric"]  # history got the record
