/* Vocalie TTS web UI — single-page workflow against the /v1 contract.
 *
 * Mirrors the reference frontend's behavior (debounced auto-prepare
 * 600 ms, chunk preview 500 ms, job polling 700 ms, schema-driven
 * dynamic fields with visible_if) without any build toolchain.
 */

"use strict";

const POLL_MS = 700;
const PREP_DEBOUNCE_MS = 600;
const PREVIEW_DEBOUNCE_MS = 500;

let apiKey = localStorage.getItem("vocalie_api_key") || "";
let engineSchema = null;
let currentJob = null;
let currentAssetId = null;

const $ = (id) => document.getElementById(id);

function headers(extra = {}) {
  const h = { ...extra };
  if (apiKey) h["X-API-Key"] = apiKey;
  return h;
}

async function api(path, opts = {}) {
  const resp = await fetch(`/v1${path}`, {
    ...opts,
    headers: headers(opts.headers || {}),
  });
  if (!resp.ok) {
    const body = await resp.text();
    throw new Error(`${resp.status}: ${body.slice(0, 200)}`);
  }
  const ct = resp.headers.get("content-type") || "";
  return ct.includes("json") ? resp.json() : resp;
}

function debounce(fn, ms) {
  let t = null;
  return (...args) => {
    clearTimeout(t);
    t = setTimeout(() => fn(...args), ms);
  };
}

/* ── health ── */
async function refreshHealth() {
  try {
    const h = await fetch("/v1/health").then((r) => r.json());
    $("health").classList.toggle("ok", h.status === "ok");
    $("health").title = `status: ${h.status}`;
  } catch {
    $("health").classList.remove("ok");
  }
}
setInterval(refreshHealth, 5000);

/* ── text preparation ── */
const autoPrepare = debounce(async () => {
  const raw = $("text-raw").value;
  if (!raw.trim()) return;
  try {
    const adj = await api("/prep/adjust", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ text_raw: raw }),
    });
    $("text-adjusted").value = adj.text_adjusted;
    const interp = await api("/prep/interpret", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ text_adjusted: adj.text_adjusted }),
    });
    const snap = await api("/chunks/snapshot", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ text_interpreted: interp.text_interpreted }),
    });
    if (!$("snapshot").dataset.userEdited) {
      $("snapshot").value = snap.snapshot_text;
      refreshPreview();
    }
  } catch (e) {
    console.warn("prep failed", e);
  }
}, PREP_DEBOUNCE_MS);

$("text-raw").addEventListener("input", autoPrepare);
$("snapshot").addEventListener("input", () => {
  $("snapshot").dataset.userEdited = "1";
  refreshPreview();
});

/* ── chunk preview + markers ── */
const refreshPreview = debounce(async () => {
  const text = $("snapshot").value;
  if (!text.trim()) {
    $("chunk-preview").innerHTML = "";
    return;
  }
  try {
    const out = await api("/chunks/preview", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ snapshot_text: text }),
    });
    $("chunk-preview").innerHTML = out.chunks
      .map(
        (c) =>
          `<li>${escapeHtml(c.text.slice(0, 90))}` +
          `<span class="dur">${(c.est_duration_s || 0).toFixed(1)}s · ${c.word_count}mots</span></li>`
      )
      .join("");
  } catch (e) {
    console.warn("preview failed", e);
  }
}, PREVIEW_DEBOUNCE_MS);

function escapeHtml(s) {
  const div = document.createElement("div");
  div.textContent = s;
  return div.innerHTML;
}

async function applyMarker(action) {
  const field = $("snapshot");
  const out = await api("/chunks/apply_marker", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      snapshot_text: field.value,
      action,
      position: field.selectionStart || 0,
    }),
  });
  field.value = out.snapshot_text_updated;
  field.dataset.userEdited = "1";
  refreshPreview();
}
$("marker-insert").addEventListener("click", () => applyMarker("insert"));
$("marker-remove").addEventListener("click", () => applyMarker("remove"));

/* ── engines + schema-driven fields ── */
async function loadEngines() {
  const out = await api("/tts/engines");
  $("engine-select").innerHTML = out.engines
    .map(
      (e) =>
        `<option value="${e.id}" ${e.available ? "" : "disabled"}>` +
        `${escapeHtml(e.label)}${e.available ? "" : " (indisponible)"}</option>`
    )
    .join("");
  await onEngineChange();
}

async function onEngineChange() {
  const engine = $("engine-select").value;
  if (!engine) return;
  const [voices, models, schema] = await Promise.all([
    api(`/tts/voices?engine=${encodeURIComponent(engine)}`),
    api(`/tts/models?engine=${encodeURIComponent(engine)}`),
    api(`/tts/engine_schema?engine=${encodeURIComponent(engine)}`),
  ]);
  $("voice-select").innerHTML =
    `<option value="">(auto)</option>` +
    voices.voices.map((v) => `<option value="${v.id}">${escapeHtml(v.label)}</option>`).join("");
  $("model-select").innerHTML =
    `<option value="">(défaut)</option>` +
    models.models.map((m) => `<option value="${m.id}">${escapeHtml(m.label)}</option>`).join("");
  engineSchema = schema;
  renderDynamicFields();
  renderVoiceDesign();
  $("stream-play").style.display = schema.capabilities?.supports_streaming ? "" : "none";
}
$("engine-select").addEventListener("change", onEngineChange);

/* ── streaming playback (POST /v1/tts/stream → Web Audio) ── */
$("stream-play").addEventListener("click", async () => {
  const text = ($("snapshot").value || $("text-raw").value).trim();
  if (!text) return alert("Saisissez un texte d'abord.");
  const btn = $("stream-play");
  btn.disabled = true;
  try {
    const resp = await fetch("/v1/tts/stream", {
      method: "POST",
      headers: headers({ "Content-Type": "application/json" }),
      body: JSON.stringify({
        engine: $("engine-select").value,
        text,
        language: $("lang-select").value,
        voice: $("voice-select").value || null,
        engine_params: currentFieldValues(),
      }),
    });
    if (!resp.ok) throw new Error(`${resp.status}: ${(await resp.text()).slice(0, 200)}`);
    const sr = Number(resp.headers.get("X-Sample-Rate")) || 24000;
    const ctx = new (window.AudioContext || window.webkitAudioContext)({ sampleRate: sr });
    const reader = resp.body.getReader();
    let playhead = ctx.currentTime + 0.05;
    let pending = new Uint8Array(0);
    let skippedHeader = false;
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      const merged = new Uint8Array(pending.length + value.length);
      merged.set(pending); merged.set(value, pending.length);
      pending = merged;
      if (!skippedHeader) {
        if (pending.length < 44) continue;
        pending = pending.slice(44);
        skippedHeader = true;
      }
      const usable = pending.length - (pending.length % 2);
      if (!usable) continue;
      const pcm = new Int16Array(pending.buffer.slice(pending.byteOffset, pending.byteOffset + usable));
      pending = pending.slice(usable);
      const buf = ctx.createBuffer(1, pcm.length, sr);
      const ch = buf.getChannelData(0);
      for (let i = 0; i < pcm.length; i++) ch[i] = pcm[i] / 32768;
      const src = ctx.createBufferSource();
      src.buffer = buf;
      src.connect(ctx.destination);
      playhead = Math.max(playhead, ctx.currentTime + 0.02);
      src.start(playhead);
      playhead += buf.duration;
    }
  } catch (err) {
    alert(`Streaming: ${err.message}`);
  } finally {
    btn.disabled = false;
  }
});

function fieldVisible(field, values) {
  if (!field.visible_if) return true;
  for (const [key, want] of Object.entries(field.visible_if)) {
    let actual;
    if (key === "supports_ref") actual = engineSchema.capabilities.supports_ref;
    else actual = values[key];
    if (Array.isArray(want) ? !want.includes(actual) : actual !== want) return false;
  }
  return true;
}

function currentFieldValues() {
  const values = {};
  for (const field of engineSchema?.fields || []) {
    const el = document.querySelector(`[data-field="${field.key}"]`);
    if (!el) continue;
    if (field.type === "bool") values[field.key] = el.checked;
    else if (field.type === "float" || field.type === "int" || field.type === "slider")
      values[field.key] = Number(el.value);
    else values[field.key] = el.value;
  }
  return values;
}

function renderDynamicFields() {
  const container = $("dynamic-fields");
  const hidden = new Set(engineSchema.capabilities.auto_resolved_keys || []);
  const prior = currentFieldValues();
  container.innerHTML = "";
  for (const field of engineSchema.fields) {
    if (hidden.has(field.key)) continue;
    const wrap = document.createElement("div");
    wrap.className = "field";
    const label = document.createElement("label");
    label.textContent = field.label || field.key;
    if (field.help) label.title = field.help;
    let input;
    const value = prior[field.key] ?? field.default;
    if (field.type === "bool") {
      input = document.createElement("input");
      input.type = "checkbox";
      input.checked = Boolean(value);
    } else if (field.type === "choice" || field.type === "select") {
      input = document.createElement("select");
      for (const choice of field.choices || []) {
        const [lab, val] = Array.isArray(choice) ? choice : [String(choice), choice];
        const opt = document.createElement("option");
        opt.value = val;
        opt.textContent = lab;
        input.appendChild(opt);
      }
      input.value = value ?? "";
    } else if (["float", "int", "slider"].includes(field.type)) {
      input = document.createElement("input");
      input.type = field.type === "slider" ? "range" : "number";
      if (field.min != null) input.min = field.min;
      if (field.max != null) input.max = field.max;
      if (field.step != null) input.step = field.step;
      input.value = value ?? 0;
    } else {
      input = document.createElement("input");
      input.type = "text";
      input.value = value ?? "";
    }
    input.dataset.field = field.key;
    input.addEventListener("change", renderDynamicFields);
    wrap.appendChild(label);
    wrap.appendChild(input);
    if (!fieldVisible(field, { ...prior, [field.key]: value }))
      wrap.style.display = "none";
    container.appendChild(wrap);
  }
}

/* ── voice design (instruction builder, ref: frontend page.tsx:83-103,
   page-constants.ts:20-113 — attribute pickers composed into a French
   `instruct` string; 5 built-in FR presets + user presets persisted
   locally) ── */
const VD_PICKERS = [
  ["gender", "Genre", { masculine: "Voix masculine", feminine: "Voix feminine" },
    [["none", "Neutre"], ["masculine", "Masculin"], ["feminine", "Feminin"]]],
  ["age", "Age", { teen: "ado", young_adult: "jeune adulte", adult: "adulte", senior: "senior" },
    [["none", "Neutre"], ["teen", "Ado"], ["young_adult", "Jeune adulte"], ["adult", "Adulte"], ["senior", "Senior"]]],
  ["texture", "Timbre", { clear: "timbre clair", warm: "timbre chaleureux", raspy: "timbre rauque", nasal: "timbre nasal" },
    [["none", "Neutre"], ["clear", "Claire"], ["warm", "Chaleureuse"], ["raspy", "Rauque"], ["nasal", "Nasale"]]],
  ["pitch", "Pitch", { low: "pitch bas", mid: "pitch moyen", high: "pitch haut" },
    [["none", "Neutre"], ["low", "Bas"], ["mid", "Moyen"], ["high", "Haut"]]],
  ["speed", "Debit", { slow: "debit lent", medium: "debit normal", fast: "debit rapide" },
    [["none", "Neutre"], ["slow", "Lent"], ["medium", "Normal"], ["fast", "Rapide"]]],
  ["volume", "Volume", { soft: "volume faible", normal: "volume normal", loud: "volume fort" },
    [["none", "Neutre"], ["soft", "Faible"], ["normal", "Normal"], ["loud", "Fort"]]],
  ["accent", "Accent", {
    fr_neutral: "accent francais neutre", fr_paris: "accent francais parisien",
    fr_quebec: "accent francais quebecois", fr_belgium: "accent francais belge",
    fr_swiss: "accent francais suisse" },
    [["none", "Neutre"], ["fr_neutral", "Francais neutre"], ["fr_paris", "Francais parisien"],
     ["fr_quebec", "Francais quebecois"], ["fr_belgium", "Francais belge"], ["fr_swiss", "Francais suisse"]]],
  ["emotion", "Emotion", {
    happy: "emotion joyeuse", sad: "emotion triste", angry: "emotion colerique",
    excited: "emotion enthousiaste", calm: "emotion calme" },
    [["none", "Neutre"], ["happy", "Joyeux"], ["sad", "Triste"], ["angry", "Colere"],
     ["excited", "Excite"], ["calm", "Calme"]]],
  ["style", "Ton", {
    conversational: "ton conversationnel", narrative: "ton narratif",
    authoritative: "ton autoritaire", dramatic: "ton dramatique" },
    [["none", "Neutre"], ["conversational", "Conversationnel"], ["narrative", "Narratif"],
     ["authoritative", "Autoritaire"], ["dramatic", "Dramatique"]]],
];

const VD_BUILTIN_PRESETS = [
  { id: "fr_news_m", label: "Journal TV FR (masculin)",
    instruct: "Voix masculine adulte, timbre clair, pitch moyen-bas, debit soutenu, volume fort, accent francais neutre. Ton autoritaire, confiant et informatif." },
  { id: "fr_story_f", label: "Narration douce FR (feminin)",
    instruct: "Voix feminine adulte, timbre doux, pitch moyen, debit moyen, volume modere, accent francais neutre. Ton chaleureux et rassurant." },
  { id: "fr_angry_m", label: "Colere FR (masculin)",
    instruct: "Voix masculine adulte, timbre rauque, pitch moyen-bas, debit rapide, volume fort. Emotion colerique, ton tranchant et percutant." },
  { id: "fr_young_f", label: "Jeune adulte FR (feminin)",
    instruct: "Voix feminine jeune adulte, pitch moyen-haut, debit rapide, volume normal, accent francais neutre. Ton enjoue et expressif." },
  { id: "fr_senior_m", label: "Senior FR (masculin)",
    instruct: "Voix masculine senior, pitch bas, debit lent, volume modere, accent francais neutre. Ton grave et pose." },
];

function vdUserPresets() {
  try { return JSON.parse(localStorage.getItem("vocalie_vd_presets") || "[]"); }
  catch { return []; }
}
function vdSaveUserPresets(list) {
  localStorage.setItem("vocalie_vd_presets", JSON.stringify(list));
}

function buildDesignInstruction(picks, language) {
  const parts = [];
  if (language && language.startsWith("fr")) parts.push("Parle en francais");
  for (const [key, , phrases] of VD_PICKERS) {
    const v = picks[key];
    if (v && v !== "none" && phrases[v]) parts.push(phrases[v]);
  }
  if (language && language.startsWith("fr") && !parts.some((p) => p.includes("accent")))
    parts.push("accent francais neutre");
  return parts.length ? parts.join(", ") + "." : "";
}

function vdRefreshPresetList() {
  const all = [...VD_BUILTIN_PRESETS, ...vdUserPresets()];
  $("vd-preset").innerHTML =
    `<option value="">(preset voix)</option>` +
    all.map((p) => `<option value="${p.id}">${escapeHtml(p.label)}</option>`).join("");
}

function renderVoiceDesign() {
  const panel = $("voice-design");
  const hasInstruct = (engineSchema?.fields || []).some((f) => f.key === "instruct");
  const supported = Boolean(engineSchema?.capabilities?.supports_voice_design);
  if (!hasInstruct || !supported) { panel.style.display = "none"; return; }
  panel.style.display = "";
  const pickers = $("vd-pickers");
  if (!pickers.childElementCount) {
    for (const [key, label, , choices] of VD_PICKERS) {
      const wrap = document.createElement("label");
      wrap.textContent = label + " ";
      const sel = document.createElement("select");
      sel.dataset.vd = key;
      for (const [val, lab] of choices) {
        const opt = document.createElement("option");
        opt.value = val;
        opt.textContent = lab;
        sel.appendChild(opt);
      }
      wrap.appendChild(sel);
      pickers.appendChild(wrap);
    }
  }
  vdRefreshPresetList();
}

function vdSetInstruct(text) {
  const input = document.querySelector('[data-field="instruct"]');
  if (input) { input.value = text; input.dispatchEvent(new Event("change")); }
}

$("vd-apply").addEventListener("click", () => {
  const picks = {};
  document.querySelectorAll("[data-vd]").forEach((el) => (picks[el.dataset.vd] = el.value));
  vdSetInstruct(buildDesignInstruction(picks, $("lang-select").value));
});
$("vd-preset-load").addEventListener("click", () => {
  const id = $("vd-preset").value;
  const preset = [...VD_BUILTIN_PRESETS, ...vdUserPresets()].find((p) => p.id === id);
  if (!preset) return;
  vdSetInstruct(preset.instruct);
  for (const [key, value] of Object.entries(preset.picks || {})) {
    const el = document.querySelector(`[data-vd="${key}"]`);
    if (el) el.value = value;
  }
});
$("vd-preset-save").addEventListener("click", () => {
  const name = $("vd-preset-name").value.trim();
  if (name.length < 2) return alert("Nom de preset trop court.");
  const id = name.toLowerCase().replace(/\s+/g, "-");
  const picks = {};
  document.querySelectorAll("[data-vd]").forEach((el) => (picks[el.dataset.vd] = el.value));
  const instruct =
    document.querySelector('[data-field="instruct"]')?.value ||
    buildDesignInstruction(picks, $("lang-select").value);
  const list = vdUserPresets().filter((p) => p.id !== id);
  list.push({ id, label: name, instruct, picks });
  list.sort((a, b) => a.label.localeCompare(b.label));
  vdSaveUserPresets(list);
  vdRefreshPresetList();
  $("vd-preset").value = id;
});
$("vd-preset-delete").addEventListener("click", () => {
  const id = $("vd-preset").value;
  if (!id || VD_BUILTIN_PRESETS.some((p) => p.id === id)) return;
  vdSaveUserPresets(vdUserPresets().filter((p) => p.id !== id));
  vdRefreshPresetList();
});

/* ── generation ── */
$("generate").addEventListener("click", async () => {
  const snapshot = $("snapshot").value.trim();
  const raw = $("text-raw").value.trim();
  if (!snapshot && !raw) return alert("Saisissez un texte d'abord.");
  const values = currentFieldValues();
  const gap = values["chunk_gap_ms"];
  delete values["chunk_gap_ms"];
  const body = {
    engine_id: $("engine-select").value,
    voice_id: $("voice-select").value || null,
    model: $("model-select").value || null,
    language: $("lang-select").value,
    text_source: "snapshot",
    text_snapshot: snapshot || raw,
    engine_params: values,
    post_params: gap != null ? { chunk_gap_ms: gap } : {},
  };
  try {
    $("generate").disabled = true;
    $("cancel").disabled = false;
    $("job-status").textContent = "envoi…";
    const job = await api("/tts/jobs", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
    currentJob = job.job_id;
    pollJob();
  } catch (e) {
    $("job-status").textContent = `erreur: ${e.message}`;
    $("generate").disabled = false;
    $("cancel").disabled = true;
  }
});

$("cancel").addEventListener("click", async () => {
  if (currentJob) await api(`/jobs/${currentJob}`, { method: "DELETE" });
});

async function pollJob() {
  if (!currentJob) return;
  try {
    const job = await api(`/jobs/${currentJob}`);
    $("job-progress").value = job.progress;
    $("job-status").textContent = job.status;
    if (["done", "error", "canceled"].includes(job.status)) {
      $("generate").disabled = false;
      $("cancel").disabled = true;
      if (job.status === "done") {
        currentAssetId = job.asset_id;
        await loadAsset(job.asset_id);
      } else if (job.status === "error") {
        $("job-status").textContent = `erreur: ${job.error}`;
      }
      currentJob = null;
      return;
    }
  } catch (e) {
    console.warn("poll failed", e);
  }
  setTimeout(pollJob, POLL_MS);
}

async function loadAsset(assetId) {
  const resp = await fetch(`/v1/assets/${assetId}`, { headers: headers() });
  const blob = await resp.blob();
  const url = URL.createObjectURL(blob);
  $("player").src = url;
  drawWaveform(await blob.arrayBuffer());
}

function drawWaveform(arrayBuffer) {
  const canvas = $("waveform");
  const ctx = canvas.getContext("2d");
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  // naive 16-bit PCM WAV parse for display purposes
  const view = new DataView(arrayBuffer);
  let offset = 44; // canonical header; close enough for visualization
  const samples = Math.floor((view.byteLength - offset) / 2);
  const step = Math.max(1, Math.floor(samples / canvas.width));
  ctx.strokeStyle = "#7dd3a0";
  ctx.beginPath();
  for (let x = 0; x < canvas.width; x++) {
    let min = 1, max = -1;
    for (let i = 0; i < step; i++) {
      const idx = offset + (x * step + i) * 2;
      if (idx + 1 >= view.byteLength) break;
      const v = view.getInt16(idx, true) / 32768;
      if (v < min) min = v;
      if (v > max) max = v;
    }
    const mid = canvas.height / 2;
    ctx.moveTo(x, mid + min * mid);
    ctx.lineTo(x, mid + max * mid);
  }
  ctx.stroke();
}

/* ── editing / AudioSR ── */
$("edit-apply").addEventListener("click", async () => {
  if (!currentAssetId) return alert("Générez d'abord un audio.");
  const out = await api("/audio/edit", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      asset_id: currentAssetId,
      trim_enabled: $("edit-trim").checked,
      normalize_enabled: $("edit-normalize").checked,
      target_dbfs: Number($("edit-dbfs").value),
    }),
  });
  currentAssetId = out.asset_id;
  await loadAsset(out.asset_id);
});

$("sr-run").addEventListener("click", async () => {
  const file = $("sr-file").files[0];
  if (!file) return alert("Choisissez un fichier audio.");
  const form = new FormData();
  form.append("file", file);
  form.append("ddim_steps", $("sr-steps").value);
  form.append("guidance_scale", $("sr-guidance").value);
  form.append("seed", $("sr-seed").value);
  form.append("multiband_ensemble", $("sr-multiband").checked ? "1" : "0");
  $("sr-status").textContent = "traitement…";
  try {
    const resp = await fetch("/v1/audio/enhance", {
      method: "POST",
      headers: headers(),
      body: form,
    });
    if (!resp.ok) throw new Error(await resp.text());
    const out = await resp.json();
    $("sr-status").textContent = `ok: ${out.duration_s.toFixed(1)}s @ ${out.sample_rate}Hz`;
    currentAssetId = out.asset_id;
    await loadAsset(out.asset_id);
  } catch (e) {
    $("sr-status").textContent = `erreur: ${e.message.slice(0, 120)}`;
  }
});

/* ── presets ── */
function collectState() {
  return {
    preparation: { text_raw: $("text-raw").value, text_adjusted: $("text-adjusted").value },
    direction: { snapshot_text: $("snapshot").value },
    engine: {
      engine_id: $("engine-select").value,
      voice_id: $("voice-select").value || null,
      language: $("lang-select").value,
      params: currentFieldValues(),
      chunk_gap_ms: Number(currentFieldValues()["chunk_gap_ms"] || 0),
    },
    post: {
      trim_enabled: $("edit-trim").checked,
      normalize_enabled: $("edit-normalize").checked,
      target_dbfs: Number($("edit-dbfs").value),
    },
  };
}

async function loadPresets() {
  const out = await api("/presets");
  $("preset-select").innerHTML =
    `<option value="">(presets)</option>` +
    out.presets.map((p) => `<option value="${p.id}">${escapeHtml(p.label || p.id)}</option>`).join("");
}

$("preset-save").addEventListener("click", async () => {
  const id = ($("preset-name").value || "preset").replace(/[^\w-]+/g, "_");
  await api("/presets", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ id, label: $("preset-name").value || id, state: collectState() }),
  });
  await loadPresets();
  $("preset-select").value = id;
});

$("preset-select").addEventListener("change", async () => {
  const id = $("preset-select").value;
  if (!id) return;
  const preset = await api(`/presets/${id}`);
  const s = preset.state;
  $("text-raw").value = s.preparation?.text_raw || "";
  $("text-adjusted").value = s.preparation?.text_adjusted || "";
  $("snapshot").value = s.direction?.snapshot_text || "";
  if (s.engine?.engine_id) {
    $("engine-select").value = s.engine.engine_id;
    await onEngineChange();
    if (s.engine.voice_id) $("voice-select").value = s.engine.voice_id;
    if (s.engine.language) $("lang-select").value = s.engine.language;
  }
  refreshPreview();
});

$("preset-delete").addEventListener("click", async () => {
  const id = $("preset-select").value;
  if (id) {
    await api(`/presets/${id}`, { method: "DELETE" });
    await loadPresets();
  }
});

/* ── glossary + refs ── */
async function loadGlossary() {
  const out = await api("/glossary");
  $("gloss-list").innerHTML = out.entries
    .map(
      (e) =>
        `<li><span>${escapeHtml(e.word)} → ${escapeHtml(e.pronunciation)}</span>` +
        `<button data-word="${escapeHtml(e.word)}">retirer</button></li>`
    )
    .join("");
  for (const btn of $("gloss-list").querySelectorAll("button")) {
    btn.addEventListener("click", async () => {
      await api(`/glossary?word=${encodeURIComponent(btn.dataset.word)}`, { method: "DELETE" });
      loadGlossary();
    });
  }
}

$("gloss-add").addEventListener("click", async () => {
  await api("/glossary", {
    method: "PUT",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ word: $("gloss-word").value, pronunciation: $("gloss-pron").value }),
  });
  $("gloss-word").value = "";
  $("gloss-pron").value = "";
  loadGlossary();
});

async function loadRefs() {
  const out = await api("/refs");
  $("ref-list").innerHTML = out.files
    .map((f) => `<li><span>${escapeHtml(f)}</span><button data-ref="${escapeHtml(f)}">supprimer</button></li>`)
    .join("");
  for (const btn of $("ref-list").querySelectorAll("button")) {
    btn.addEventListener("click", async () => {
      await api(`/refs/${encodeURIComponent(btn.dataset.ref)}`, { method: "DELETE" });
      loadRefs();
      onEngineChange();
    });
  }
}

$("ref-send").addEventListener("click", async () => {
  const files = $("ref-upload").files;
  if (!files.length) return;
  const form = new FormData();
  for (const f of files) form.append("files", f);
  await fetch("/v1/refs/upload", { method: "POST", headers: headers(), body: form });
  loadRefs();
  onEngineChange();
});

/* ── api key ── */
$("api-key").value = apiKey;
$("api-key-save").addEventListener("click", () => {
  apiKey = $("api-key").value.trim();
  localStorage.setItem("vocalie_api_key", apiKey);
  boot();
});

/* ── boot ── */
async function boot() {
  refreshHealth();
  try {
    await Promise.all([loadEngines(), loadPresets(), loadGlossary(), loadRefs()]);
  } catch (e) {
    console.warn("boot partial failure (missing API key?)", e);
  }
}
boot();
