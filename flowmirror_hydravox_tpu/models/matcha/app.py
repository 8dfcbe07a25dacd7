"""Matcha-TTS web demo (reference matcha/app.py:149 Gradio demo equivalent).

Gradio is not in this image, so this is a single dependency-free HTML page +
JSON API served by the stdlib HTTP server, mirroring the reference demo's
controls (text, ODE steps, temperature, speaking rate).

Usage:
  python -m flowmirror_hydravox_tpu.models.matcha.app --port 7860 \
      [--checkpoint matcha.npz] [--vocoder hifigan.npz] [--tiny]
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger("hydravox.matcha.app")

PAGE = """<!DOCTYPE html><html><head><meta charset="utf-8"/>
<title>Matcha-TTS (TPU)</title>
<style>body{font-family:system-ui;max-width:640px;margin:40px auto;color:#1d2733}
textarea,input{width:100%;box-sizing:border-box;padding:8px;margin:4px 0 12px;border:1px solid #c6d2de;border-radius:6px}
button{background:#2374ab;color:#fff;border:none;padding:10px 22px;border-radius:6px;cursor:pointer}
.row{display:flex;gap:12px}.row>div{flex:1}label{font-size:13px;color:#49617a}</style></head>
<body><h2>Matcha-TTS &mdash; TPU-native CFM demo</h2>
<label>Text</label><textarea id="text">The quick brown fox jumps over the lazy dog.</textarea>
<div class="row">
 <div><label>ODE steps</label><input id="steps" type="number" value="10"/></div>
 <div><label>Temperature</label><input id="temp" type="number" value="0.667" step="0.05"/></div>
 <div><label>Speaking rate</label><input id="rate" type="number" value="1.0" step="0.05"/></div>
</div>
<button id="go">Synthesise</button> <span id="status"></span>
<audio id="audio" controls style="width:100%;margin-top:14px"></audio>
<script>
document.getElementById('go').onclick = async () => {
  const s = document.getElementById('status'); s.textContent = 'synthesising...';
  const r = await fetch('/synthesise', {method:'POST',headers:{'Content-Type':'application/json'},
    body: JSON.stringify({text: document.getElementById('text').value,
      steps: +document.getElementById('steps').value,
      temperature: +document.getElementById('temp').value,
      speaking_rate: +document.getElementById('rate').value})});
  const j = await r.json();
  if (j.success) { const a = document.getElementById('audio');
    a.src = 'data:audio/wav;base64,' + j.audio_base64; a.play();
    s.textContent = `ok: ${j.duration.toFixed(2)} s (rtf ${j.rtf.toFixed(3)})`;
  } else s.textContent = 'error: ' + j.error;
};
</script></body></html>"""


def build_synth(checkpoint=None, vocoder=None, tiny=False):
    import jax
    import jax.numpy as jnp

    from ...train.checkpoint import load_params_npz
    from . import model as matcha_model
    from . import text as matcha_text
    from . import vocoder as hifigan
    from .model import MatchaConfig
    from .vocoder import HiFiGANConfig

    cfg = MatchaConfig()
    voc_cfg = HiFiGANConfig()
    if tiny:  # smoke/demo-infrastructure testing on CPU
        from .decoder import MatchaDecoderConfig
        from .text_encoder import MatchaEncoderConfig

        cfg = MatchaConfig(
            encoder=MatchaEncoderConfig(n_feats=16, n_channels=32,
                                        filter_channels=64, filter_channels_dp=32,
                                        n_heads=2, n_layers=2),
            decoder=MatchaDecoderConfig(in_feats=16, channels=(32, 32),
                                        attention_head_dim=8, num_heads=4,
                                        n_blocks=1, num_mid_blocks=1),
            n_feats=16,
        )
        voc_cfg = HiFiGANConfig(in_channels=16, upsample_initial_channel=64)
    params = matcha_model.init_params(jax.random.PRNGKey(0), cfg)
    voc_params = hifigan.init_params(jax.random.PRNGKey(1), voc_cfg)
    if checkpoint:
        params = load_params_npz(checkpoint, params)
    if vocoder:
        voc_params = load_params_npz(vocoder, voc_params)

    # vocoder bias denoiser (reference app.py uses cli.load_vocoder's
    # Denoiser, cli.py:103); bias spectrum computed once at build time
    from . import denoiser as dn

    bias_spec = dn.make_bias_spec(
        lambda m: hifigan.forward(voc_params, voc_cfg, m),
        n_mels=voc_cfg.in_channels, mode="zeros")

    def synth(text: str, steps: int, temperature: float, speaking_rate: float):
        ids = matcha_text.intersperse(matcha_text.text_to_sequence(text))
        x = jnp.asarray(ids, jnp.int32)[None]
        t0 = time.time()
        out = matcha_model.synthesise(
            params, cfg, jax.random.PRNGKey(int(time.time())), x,
            jnp.asarray([len(ids)]), n_timesteps=steps,
            temperature=temperature, length_scale=1.0 / speaking_rate,
        )
        ml = int(out["mel_lengths"][0])
        mel = out["mel"][:, :, :ml]
        wav_j = hifigan.forward(voc_params, voc_cfg, mel)
        wav = np.asarray(dn.denoise(wav_j, bias_spec))[0]
        dt = time.time() - t0
        return wav, cfg.sample_rate, dt

    return synth


def main(argv=None):
    p = argparse.ArgumentParser("matcha-app")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocoder", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu); --tiny defaults to cpu")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    platform = args.platform or ("cpu" if args.tiny else None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from ...utils.wavio import encode_wav

    synth = build_synth(args.checkpoint, args.vocoder, args.tiny)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            logger.debug(fmt, *a)

        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(200, PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/synthesise":
                self._send(404, {"success": False, "error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                wav, sr, dt = synth(
                    body.get("text", ""), int(body.get("steps", 10)),
                    float(body.get("temperature", 0.667)),
                    float(body.get("speaking_rate", 1.0)),
                )
                self._send(200, {
                    "success": True,
                    "audio_base64": base64.b64encode(encode_wav(wav, sr)).decode(),
                    "duration": len(wav) / sr,
                    "rtf": dt * sr / max(len(wav), 1),
                })
            except Exception as e:
                logger.exception("synthesise failed")
                self._send(500, {"success": False, "error": str(e)})

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    logger.info("matcha demo on %s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
