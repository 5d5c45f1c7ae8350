"""Stdlib web UI (flocoder_tpu.ui.webapp): the first-party replacement for
the reference's gradio app (reference: generate_samples.py:243-343)."""
import threading
import urllib.request
import urllib.parse

from flocoder_tpu.config import config_from_dict
from flocoder_tpu.ui.webapp import create_app


def _serve(tmp_path):
    cfg = config_from_dict({"n_steps": 8, "seed": 1})
    server = create_app(cfg, out_dir=str(tmp_path / "out"))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


def test_form_renders_and_files_404(tmp_path):
    server, base = _serve(tmp_path)
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        for field in ("ckpt", "n_samples", "cfg", "method", "steps", "seed"):
            assert f'name="{field}"' in page
        for m in ("rk4", "euler", "rk45"):
            assert f'value="{m}"' in page
        try:
            urllib.request.urlopen(base + "/files/nope.png", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_post_with_bad_checkpoint_reports_error(tmp_path):
    server, base = _serve(tmp_path)
    try:
        data = urllib.parse.urlencode({
            "ckpt": "/nonexistent.npz", "n_samples": 2, "cfg": 1.0,
            "method": "rk4", "steps": 4, "seed": 0}).encode()
        page = urllib.request.urlopen(base + "/generate", data=data,
                                      timeout=60).read().decode()
        assert "ERROR" in page  # rendered, not crashed
    finally:
        server.shutdown()
        server.server_close()
