"""Minimal HTTP inference server over an exported serving artifact.

Completes the deployment path (export_model.py -> artifact -> THIS): a
stdlib-only daemon (no web framework in the image) that loads a Servable
and answers SR requests. The reference has no serving story at all
(ship-the-repo, SURVEY.md §3.2); this is the beyond-parity production
surface the artifact format was designed for::

    python -m esr_tpu.scripts.serve --artifact /path/artifact --port 8008

Protocol (kept deliberately dumb — one request = one image):

- ``POST /sr`` with a PNG/JPEG body -> PNG SR image. Optional headers:
  ``X-Z-Mode: zeros|random`` (default zeros) and ``X-Z-Seed: <int>`` for
  reproducible random-Z draws on explorable artifacts; ``random`` without a
  seed draws fresh entropy per request (a different SR every time).
- ``GET /healthz`` -> 200 once the artifact is loaded; body is the manifest
  (JSON), so orchestration can read scale/buckets/platforms.

Float SR output is clipped to [0,1] and quantized exactly like the eval
pipeline (``ops.color.to_uint8``-equivalent round) before PNG encoding.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["make_server", "main"]


def _decode_image(body: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(body)).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def _encode_png(sr: np.ndarray) -> bytes:
    from PIL import Image

    from esr_tpu.ops.color import tensor2img

    buf = io.BytesIO()
    Image.fromarray(tensor2img(sr)).save(buf, format="PNG")
    return buf.getvalue()


def make_server(artifact_dir: str, host: str = "127.0.0.1", port: int = 8008):
    """Build (not start) the HTTP server; returns a ThreadingHTTPServer whose
    ``serve_forever()``/``shutdown()`` the caller owns (tests run it on a
    thread)."""
    from esr_tpu.export import load_servable

    servable = load_servable(artifact_dir)
    # Servable.sr is not re-entrant-safe by contract (lazy deserialize dict);
    # serialize inference — single accelerator anyway
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/healthz":
                body = json.dumps(servable.manifest).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
            if self.path != "/sr":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                try:
                    lr = _decode_image(body)
                except Exception as e:  # noqa: BLE001 — PIL raises OSError
                    # subclasses (UnidentifiedImageError) on junk bodies;
                    # any decode failure is the client's fault
                    self._reply(400, f"bad image: {e}".encode(), "text/plain")
                    return
                z = None
                if servable.nz and (
                    (self.headers.get("X-Z-Mode") or "zeros").lower() == "random"
                ):
                    seed = self.headers.get("X-Z-Seed")
                    rng = np.random.default_rng(None if seed is None else int(seed))
                    z = rng.uniform(
                        -1, 1, lr.shape[:2] + (servable.nz,)
                    ).astype(np.float32)
                with lock:
                    sr = servable.sr(lr, z)[0]
                self._reply(200, _encode_png(sr), "image/png")
            except ValueError as e:  # no fitting bucket, bad z/seed
                self._reply(400, str(e).encode(), "text/plain")
            except Exception as e:  # noqa: BLE001 — surface, don't kill the daemon
                self._reply(500, f"{type(e).__name__}: {e}".encode(), "text/plain")

    server = ThreadingHTTPServer((host, port), Handler)
    server.servable = servable  # for callers/tests
    return server


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact", required=True, help="export_model.py output dir")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    args = parser.parse_args(argv)
    server = make_server(args.artifact, args.host, args.port)
    m = server.servable.manifest
    print(
        f"serving x{m['scale']} SR on http://{args.host}:{args.port} "
        f"(buckets: {[(e['batch'], e['h'], e['w']) for e in m['buckets']]})",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
