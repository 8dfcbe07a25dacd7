"""Built-in web UI (reference user_interface/ Gradio tabs equivalent).

Gradio is not part of this image, so the UI is a single dependency-free HTML
page served by the API server itself (enable with serve(..., with_ui=True)).
It covers the reference's four tabs (user_interface/tabs/__init__.py):
inference (preset-speaker TTS + params), zero-shot voice cloning (wav
upload), training (start/stop/status + live log tail), and speakers.
All actions go through the same REST API as the reference UI's APIClient.
"""

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<title>HydraVox TPU</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 0; background: #f5f6f8; color: #1d2733; }
 header { background: #16324f; color: #fff; padding: 14px 24px; font-size: 20px; }
 nav { display: flex; gap: 4px; background: #1d4065; padding: 0 16px; }
 nav button { background: none; border: none; color: #cfe0f1; padding: 10px 16px; cursor: pointer; font-size: 14px; }
 nav button.active { background: #f5f6f8; color: #16324f; border-radius: 6px 6px 0 0; }
 main { padding: 24px; max-width: 860px; margin: 0 auto; }
 section { display: none; background: #fff; border-radius: 8px; padding: 20px; box-shadow: 0 1px 3px rgba(0,0,0,.08); }
 section.active { display: block; }
 label { display: block; margin: 10px 0 4px; font-size: 13px; color: #49617a; }
 textarea, input, select { width: 100%; box-sizing: border-box; padding: 8px; border: 1px solid #c6d2de; border-radius: 6px; font-size: 14px; }
 textarea { min-height: 90px; }
 .row { display: flex; gap: 12px; } .row > div { flex: 1; }
 button.go { margin-top: 14px; background: #2374ab; color: #fff; border: none; padding: 10px 22px; border-radius: 6px; font-size: 15px; cursor: pointer; }
 button.go:disabled { background: #9db4c8; }
 audio { width: 100%; margin-top: 14px; }
 pre { background: #10141a; color: #b9e08c; padding: 12px; border-radius: 6px; max-height: 300px; overflow: auto; font-size: 12px; }
 .status { margin-top: 10px; font-size: 13px; color: #49617a; }
</style>
</head>
<body>
<header>HydraVox TPU &mdash; multi-head TTS</header>
<nav>
 <button data-tab="tts" class="active">Inference</button>
 <button data-tab="zeroshot">Zero-shot</button>
 <button data-tab="training">Training</button>
 <button data-tab="speakers">Speakers</button>
</nav>
<main>
<section id="tab-tts" class="active">
 <label>Text</label><textarea id="tts-text">Hello from the TPU-native HydraVox.</textarea>
 <div class="row">
  <div><label>Speaker</label><select id="tts-speaker"></select></div>
  <div><label>Heads (1-5)</label><input id="tts-heads" type="number" value="2" min="1" max="5"/></div>
  <div><label>Speed</label><input id="tts-speed" type="number" value="1.0" step="0.1"/></div>
 </div>
 <div class="row">
  <div><label>top_p</label><input id="tts-topp" type="number" value="0.9" step="0.05"/></div>
  <div><label>top_k</label><input id="tts-topk" type="number" value="10"/></div>
  <div><label>win_size</label><input id="tts-win" type="number" value="24"/></div>
  <div><label>tau_r</label><input id="tts-tau" type="number" value="0.2" step="0.05"/></div>
 </div>
 <button class="go" id="tts-go">Synthesize</button>
 <div class="status" id="tts-status"></div>
 <audio id="tts-audio" controls></audio>
</section>

<section id="tab-zeroshot">
 <label>Text to synthesize</label><textarea id="zs-text"></textarea>
 <label>Prompt transcript</label><input id="zs-prompt-text"/>
 <label>Prompt audio (wav)</label><input id="zs-file" type="file" accept=".wav,audio/wav"/>
 <div class="row">
  <div><label>Heads</label><input id="zs-heads" type="number" value="2" min="1" max="5"/></div>
  <div><label>Speed</label><input id="zs-speed" type="number" value="1.0" step="0.1"/></div>
 </div>
 <button class="go" id="zs-go">Clone &amp; synthesize</button>
 <div class="status" id="zs-status"></div>
 <audio id="zs-audio" controls></audio>
</section>

<section id="tab-training">
 <div class="row">
  <div><label>Model</label><select id="tr-type"><option>llm</option><option>flow</option></select></div>
  <div><label>Batch size</label><input id="tr-bs" type="number" value="4"/></div>
  <div><label>Learning rate</label><input id="tr-lr" value="1e-4"/></div>
 </div>
 <label>Train data (HF dataset dir)</label><input id="tr-data"/>
 <label>Output dir</label><input id="tr-out" value="checkpoints/training"/>
 <label>Init checkpoint (optional)</label><input id="tr-ckpt"/>
 <button class="go" id="tr-go">Start training</button>
 <button class="go" id="tr-stop" style="background:#ab3b23">Stop</button>
 <div class="status" id="tr-status"></div>
 <img id="tr-plot" style="max-width:100%; margin-top:10px; display:none"/>
 <pre id="tr-log"></pre>
</section>

<section id="tab-speakers">
 <button class="go" id="spk-refresh">Refresh</button>
 <pre id="spk-list"></pre>
</section>
</main>

<script>
const $ = (id) => document.getElementById(id);
document.querySelectorAll('nav button').forEach(b => b.onclick = () => {
  document.querySelectorAll('nav button').forEach(x => x.classList.remove('active'));
  document.querySelectorAll('section').forEach(x => x.classList.remove('active'));
  b.classList.add('active'); $('tab-' + b.dataset.tab).classList.add('active');
});
async function api(path, body) {
  const opts = body ? {method: 'POST', headers: {'Content-Type': 'application/json'},
                       body: JSON.stringify(body)} : {};
  const r = await fetch('/api/v1' + path, opts);
  return r.json();
}
function playAudio(el, b64) { el.src = 'data:audio/wav;base64,' + b64; el.play(); }

async function loadSpeakers() {
  const r = await api('/speakers');
  const sel = $('tts-speaker'); sel.innerHTML = '';
  (r.data?.speakers || []).forEach(s => { const o = document.createElement('option'); o.textContent = s; sel.appendChild(o); });
  $('spk-list').textContent = JSON.stringify(r.data, null, 2);
}
loadSpeakers();
$('spk-refresh').onclick = loadSpeakers;

$('tts-go').onclick = async () => {
  $('tts-go').disabled = true; $('tts-status').textContent = 'synthesizing...';
  try {
    const r = await api('/tts', {text: $('tts-text').value, speaker_id: $('tts-speaker').value,
      extra_params: {top_p: +$('tts-topp').value, top_k: +$('tts-topk').value,
        win_size: +$('tts-win').value, tau_r: +$('tts-tau').value,
        speed: +$('tts-speed').value, inference_head_num: +$('tts-heads').value}});
    if (r.success) { playAudio($('tts-audio'), r.data.audio_base64);
      $('tts-status').textContent = `ok: ${r.data.duration.toFixed(2)} s`; }
    else $('tts-status').textContent = 'error: ' + r.error;
  } finally { $('tts-go').disabled = false; }
};

$('zs-go').onclick = async () => {
  const f = $('zs-file').files[0];
  if (!f) { $('zs-status').textContent = 'pick a prompt wav first'; return; }
  const b64 = btoa(String.fromCharCode(...new Uint8Array(await f.arrayBuffer())));
  $('zs-go').disabled = true; $('zs-status').textContent = 'cloning...';
  try {
    const r = await api('/zero-shot', {tts_text: $('zs-text').value,
      prompt_text: $('zs-prompt-text').value, prompt_audio_base64: b64,
      extra_params: {speed: +$('zs-speed').value, inference_head_num: +$('zs-heads').value}});
    if (r.success) { playAudio($('zs-audio'), r.data.audio_base64);
      $('zs-status').textContent = `ok: ${r.data.duration.toFixed(2)} s`; }
    else $('zs-status').textContent = 'error: ' + r.error;
  } finally { $('zs-go').disabled = false; }
};

let trainingId = null, poller = null;
$('tr-go').onclick = async () => {
  const r = await api('/training/start', {model_type: $('tr-type').value,
    train_data: $('tr-data').value, output_dir: $('tr-out').value,
    model_checkpoint: $('tr-ckpt').value || null,
    batch_size: +$('tr-bs').value, learning_rate: +$('tr-lr').value});
  if (!r.success) { $('tr-status').textContent = 'error: ' + r.error; return; }
  trainingId = r.data.training_id;
  $('tr-status').textContent = 'running: ' + trainingId;
  clearInterval(poller);
  poller = setInterval(async () => {
    const s = await api('/training/status/' + trainingId);
    if (s.success) {
      $('tr-status').textContent = `${s.data.status} (${Math.round(s.data.elapsed_s)} s)`;
      if (s.data.new_log) { $('tr-log').textContent += s.data.new_log;
        $('tr-log').scrollTop = $('tr-log').scrollHeight; }
      const img = $('tr-plot');
      img.src = '/api/v1/training/plot/' + trainingId + '?t=' + Date.now();
      img.style.display = 'block';
      if (s.data.status !== 'running') clearInterval(poller);
    }
  }, 2000);
};
$('tr-stop').onclick = async () => {
  if (trainingId) await api('/training/stop/' + trainingId, {});
};
</script>
</body>
</html>
"""
