"""Training process manager (reference server/training_manager.py:13-322).

Spawns training as a subprocess process-group
(`python -m flowmirror_hydravox_tpu.train.train_llm|train_flow`), tracks
status, tails logs incrementally, stops with SIGTERM -> SIGKILL escalation.
One training at a time (reference behavior)."""

from __future__ import annotations

import logging
import os
import signal
import subprocess
import sys
import threading
import time
import uuid
from typing import Dict, List, Optional

logger = logging.getLogger("hydravox.training_manager")


class TrainingManager:
    def __init__(self):
        self.lock = threading.Lock()
        self.trainings: Dict[str, dict] = {}
        self.active_id: Optional[str] = None

    # -- lifecycle -----------------------------------------------------------

    _TRAIN_MODULES = {
        "llm": "train_llm",
        "flow": "train_flow",
        "hift": "train_hift",
        "dpo": "train_dpo",
    }

    def build_command(self, req: dict) -> List[str]:
        """Mirror of reference _build_training_command (training_manager.py:78):
        request fields -> CLI args, per model family (llm/flow/hift/dpo)."""
        model_type = req.get("model_type", "llm")
        module = "flowmirror_hydravox_tpu.train." + self._TRAIN_MODULES.get(
            model_type, "train_llm")
        cmd = [
            sys.executable, "-m", module,
            "--train_data", req["train_data"],
            "--output_dir", req.get("output_dir", "checkpoints/training"),
            "--batch_size", str(req.get("batch_size", 4)),
            "--learning_rate", str(req.get("learning_rate", 1e-4)),
            "--logging_steps", str(req.get("logging_steps", 50)),
            "--save_steps", str(req.get("save_steps", 2000)),
        ]
        if req.get("model_checkpoint") and model_type != "hift":
            cmd += ["--model_ckpt", req["model_checkpoint"]]
        if req.get("epochs") and model_type not in ("hift",):
            cmd += ["--epochs", str(req["epochs"])]
        if req.get("max_steps"):
            cmd += ["--max_steps", str(req["max_steps"])]
        if req.get("warmup_steps") and model_type != "hift":
            cmd += ["--warmup_steps", str(req["warmup_steps"])]
        if req.get("shard_optimizer"):
            cmd.append("--shard_optimizer")
        if req.get("tensor_parallel") and model_type in ("llm", "flow"):
            cmd += ["--tensor_parallel", str(req["tensor_parallel"])]
        if req.get("pipeline_parallel") and model_type == "llm":
            cmd += ["--pipeline_parallel", str(req["pipeline_parallel"])]
            if req.get("pp_microbatches"):
                cmd += ["--pp_microbatches", str(req["pp_microbatches"])]
        if req.get("phoneme_aug") and model_type == "llm":
            cmd.append("--phoneme_aug")
        if model_type == "llm":
            if req.get("tokenizer_path"):
                cmd += ["--tokenizer_path", req["tokenizer_path"]]
            if req.get("auto_val_split"):
                cmd += ["--auto_val_split", "--val_split_ratio",
                        str(req.get("val_split_ratio", 0.05))]
        return cmd

    def build_data_command(self, req: dict) -> List[str]:
        """Data-pipeline stages (reference data_tab.py one-click pipeline):
        stage 1 resample, 2 vad, 3 transcribe, 4 extract, 5 merge."""
        stage = str(req.get("stage"))
        base = [sys.executable, "-m"]
        if stage == "1":
            return base + ["flowmirror_hydravox_tpu.preprocess.resample",
                           "--input_dir", req["input_dir"], "--output_dir", req["output_dir"],
                           "--sample_rate", str(req.get("sample_rate", 24000))]
        if stage == "2":
            cmd = base + ["flowmirror_hydravox_tpu.preprocess.vad",
                          "--input_dir", req["input_dir"], "--output_dir", req["output_dir"]]
            for key, flag in (("min_dur", "--min_dur"), ("max_dur", "--max_dur"),
                              ("min_gap", "--min_gap"), ("vad_model", "--model")):
                if req.get(key) is not None:
                    cmd += [flag, str(req[key])]
            return cmd
        if stage == "3":
            cmd = base + ["flowmirror_hydravox_tpu.preprocess.transcribe",
                          "--input_dir", req["input_dir"], "--output_dir", req["output_dir"]]
            if req.get("transcript_file"):
                cmd += ["--transcript_file", req["transcript_file"]]
            if req.get("asr_module"):
                cmd += ["--asr_module", req["asr_module"]]
            for key, flag in (("num_workers", "--num_workers"),
                              ("min_sec", "--min_sec")):
                if req.get(key) is not None:
                    cmd += [flag, str(req[key])]
            if req.get("normalize_loudness"):
                cmd.append("--normalize_loudness")
            if req.get("no_filename_fallback"):
                cmd.append("--no_filename_fallback")
            return cmd
        if stage == "4":
            return base + ["flowmirror_hydravox_tpu.preprocess.extract_tokens",
                           "--input_dir", req["input_dir"], "--output_dir", req["output_dir"]]
        if stage == "5":
            return base + ["flowmirror_hydravox_tpu.preprocess.merge",
                           "--input_dir", req["input_dir"], "--output_dir", req["output_dir"]]
        raise ValueError(f"unknown stage {stage}")

    def start_data_stage(self, req: dict) -> dict:
        """Run a preprocessing stage as a tracked subprocess (same lifecycle
        as trainings; shows up in list/status with model_type=data)."""
        try:
            cmd = self.build_data_command(req)
        except (KeyError, ValueError) as e:
            return {"success": False, "error": str(e)}
        return self._spawn(cmd, req.get("output_dir", "data_out"), f"data_stage{req.get('stage')}")

    def _spawn(self, cmd: List[str], output_dir: str, label: str) -> dict:
        with self.lock:
            tid = str(uuid.uuid4())[:8]
            os.makedirs(output_dir, exist_ok=True)
            log_path = os.path.join(output_dir, f"{label}_{tid}.log")
            log_f = open(log_path, "w")
            # make the package importable regardless of the server's cwd
            pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            env = dict(os.environ)
            env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
            try:
                proc = subprocess.Popen(
                    cmd, stdout=log_f, stderr=subprocess.STDOUT, env=env,
                    start_new_session=True,  # its own process group
                )
            except Exception as e:
                log_f.close()
                return {"success": False, "error": str(e)}
            self.trainings[tid] = {
                "id": tid,
                "status": "running",
                "command": cmd,
                "pid": proc.pid,
                "process": proc,
                "log_path": log_path,
                "log_file": log_f,
                "log_offset": 0,
                "model_type": label,
                "output_dir": output_dir,
                "start_time": time.time(),
            }
            logger.info("started %s %s: %s", label, tid, " ".join(cmd))
            return {"success": True, "training_id": tid, "log_path": log_path}

    def start_training(self, req: dict) -> dict:
        with self.lock:
            if self.active_id and self.trainings[self.active_id]["status"] == "running":
                return {"success": False, "error": "a training is already running"}
        try:
            cmd = self.build_command(req)
        except KeyError as e:
            return {"success": False, "error": f"missing field {e}"}
        result = self._spawn(cmd, req.get("output_dir", "checkpoints/training"),
                             req.get("model_type", "llm"))
        if result.get("success"):
            self.active_id = result["training_id"]
        return result

    def stop_training(self, tid: str, grace_s: float = 10.0) -> dict:
        """SIGTERM the process group, escalate to SIGKILL
        (training_manager.py:169-206)."""
        with self.lock:
            entry = self.trainings.get(tid)
            if entry is None:
                return {"success": False, "error": f"unknown training {tid}"}
            proc = entry["process"]
        if proc.poll() is None:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
            except ProcessLookupError:
                pass
            deadline = time.time() + grace_s
            while proc.poll() is None and time.time() < deadline:
                time.sleep(0.2)
            if proc.poll() is None:
                try:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
        with self.lock:
            entry["status"] = "stopped"
            entry["log_file"].close()
        return {"success": True}

    # -- status --------------------------------------------------------------

    def _refresh(self, entry: dict):
        proc = entry["process"]
        if entry["status"] == "running" and proc.poll() is not None:
            entry["status"] = "completed" if proc.returncode == 0 else "failed"
            entry["returncode"] = proc.returncode
            entry["log_file"].close()

    def get_training_status(self, tid: str, tail_bytes: int = 65536) -> dict:
        """Status + incremental log tail (training_manager.py:225-276)."""
        with self.lock:
            entry = self.trainings.get(tid)
            if entry is None:
                return {"success": False, "error": f"unknown training {tid}"}
            self._refresh(entry)
            new_log = ""
            try:
                with open(entry["log_path"]) as f:
                    f.seek(entry["log_offset"])
                    new_log = f.read(tail_bytes)
                    entry["log_offset"] = f.tell()
            except OSError:
                pass
            return {
                "success": True,
                "training_id": tid,
                "status": entry["status"],
                "model_type": entry["model_type"],
                "output_dir": entry["output_dir"],
                "elapsed_s": time.time() - entry["start_time"],
                "new_log": new_log,
                "returncode": entry.get("returncode"),
            }

    def list_trainings(self) -> List[dict]:
        with self.lock:
            for e in self.trainings.values():
                self._refresh(e)
            return [
                {k: e[k] for k in ("id", "status", "model_type", "output_dir")}
                for e in self.trainings.values()
            ]


training_manager = TrainingManager()
