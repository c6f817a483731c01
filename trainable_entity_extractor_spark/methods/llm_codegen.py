"""M9 LLM-codegen method family — the reference's Gemini/Ollama slot.

The reference's LLM methods (GeminiTextMethod.py:10-48, GeminiRun.py:17-228,
OllamaTextMethod.py — same shape, different client) are NOT chat
extractors: they are iterative PROGRAM SYNTHESIS. Each training round
builds a prompt from (input, output) examples, asks the model for a
self-contained Python `extract(text)` function, extracts the fenced code
block, executes it in a curated namespace (pre-imported stdlib modules, but
FULL builtins — like the reference's exec path, NOT a sandbox: a hosted
LLM plugged into `code_model` runs unsandboxed model code), scores it
on the held-out
samples, and feeds the MISTAKES into the next, larger round
(max_training_size 5 → 15 → 45, seeded random.sample of prior mistakes);
the code with the fewest mistakes is persisted and predict just runs it.

Everything in that loop is ordinary, reproducible algorithm — only the
one call that turns a prompt into code needs a model. This module
implements the full loop from scratch with that call behind a pluggable
`code_model: Callable[[str], str]`:

- `deterministic_code_model` (default): a real, offline program
  synthesizer. It parses the examples back out of the prompt and walks a
  hypothesis ladder — normalized echo, de-spaced echo, constant
  prefix/suffix subtraction, induced anchored regex (rexpy_lite), ISO
  date lift — emitting genuine standalone Python source for the first
  hypothesis consistent with EVERY example (else a function returning
  ''). Weaker than a frontier LLM by construction, and documented so —
  but the generated artifact is real code, executed by the same
  (unsandboxed) exec path the reference uses.
- a Gemini/Ollama client drops in as `code_model=lambda prompt:
  client(...)` without touching anything else (the reference's
  `_set_code_from_model`, GeminiRun.py:67-73, is exactly this shape).

The prompt sections mirror the reference's structure (task / examples /
requirements / output format) with original wording; examples are
embedded in the same fenced-block form the synthesizer and any real
model read back.
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import pandas as pd

from ..functions import rexpy_lite
from .base import MethodBase, input_texts_by_lines


@dataclass(frozen=True, eq=False)
class CodegenSample:
    """GeminiSample analog (GeminiSample.py:7-36): one (input, output)
    example; prediction samples carry output='' (or [] for the
    multi-option seat). eq=False keeps IDENTITY hash/eq — the reference
    sets `__hash__ = object.__hash__` for the same reason: list-valued
    outputs are unhashable, and the dedup sets track sample identity."""

    input_text: str
    output: str | list[str] = ""


_EXAMPLE_BLOCK = re.compile(
    r"Input:\n```(.*?)```\nOutput:\n```(.*?)```", re.S
)


def extract_fenced_code(answer: str) -> str:
    """Reference GeminiRun._set_code_from_model:67-73: take everything
    between the first ```python fence and the last ``` fence."""
    start = answer.find("```python\n")
    if start < 0:
        return ""
    start += len("```python\n")
    end = answer.rfind("```")
    return answer[start:end] if end > start else ""


def build_prompt(samples: list[CodegenSample]) -> str:
    """Same section structure as GeminiRun._set_prompt:119-137 (task,
    examples, requirements, output format), original wording; the
    examples section is machine-readable (fenced input/output blocks)."""
    examples = "\n\n".join(
        f"**Example {i}**\nInput:\n```{s.input_text}```\nOutput:\n```{s.output}```"
        for i, s in enumerate(samples, 1)
    )
    return (
        "**Task**\nInfer the transformation from the input/output examples "
        "below and implement it.\n\n"
        f"**Examples**\n{examples}\n\n"
        "**Requirements**\n"
        "1. Define a single Python function `extract(text: str)`.\n"
        "2. Return only the function definition in a fenced code block.\n"
        "3. Return an empty string when no pattern applies.\n"
        "4. Use only the Python standard library; imports go inside the "
        "function.\n\n"
        "**Output Format**\n```python\ndef extract(text: str):\n    ...\n```"
    )


def _parse_examples(prompt: str) -> list[CodegenSample]:
    return [
        CodegenSample(input_text=m[0], output=m[1])
        for m in _EXAMPLE_BLOCK.findall(prompt)
    ]


def _consistent(code: str, samples: list[CodegenSample]) -> bool:
    fn = load_extract_function(code)
    if fn is None:
        return False
    for s in samples:
        try:
            got = fn(s.input_text)
        except Exception:
            return False
        if str(got if got is not None else "").strip() != s.output.strip():
            return False
    return True


def deterministic_code_model(prompt: str) -> str:
    """Offline program synthesizer for the model slot: hypothesis ladder
    over the parsed examples; emits source for the first hypothesis that
    reproduces every example. Returns a fenced answer exactly like a
    hosted model would."""
    samples = [s for s in _parse_examples(prompt) if s.input_text]
    candidates: list[str] = [
        # H1: normalized echo (the identity family)
        "def extract(text: str):\n    return ' '.join(text.split())\n",
        # H2: de-spaced echo
        "def extract(text: str):\n    return ''.join(text.split())\n",
    ]
    if samples:
        # H3: induced anchored regex over the outputs (the regex family) —
        # tried BEFORE literal boundary subtraction because it generalizes
        # to unseen surrounding text, which is what the hosted models the
        # slot stands in for reliably prefer
        outputs = [s.output for s in samples if s.output]
        if outputs:
            try:
                induced = rexpy_lite.extract(outputs)
            except Exception:
                induced = []
            if len(induced) == 1:
                pattern = induced[0][1:-1]  # unanchor, RegexMethod-style
                candidates.append(
                    "def extract(text: str):\n"
                    "    import re\n"
                    f"    m = re.search({pattern!r}, text)\n"
                    "    return m.group(0) if m else ''\n"
                )
        # H4: constant prefix/suffix subtraction (the boundary family)
        fronts, backs = set(), set()
        for s in samples:
            pos = s.input_text.find(s.output)
            if s.output and pos >= 0:
                fronts.add(s.input_text[:pos])
                backs.add(s.input_text[pos + len(s.output) :])
        if len(fronts) == 1 and len(backs) == 1:
            front, back = next(iter(fronts)), next(iter(backs))
            candidates.append(
                "def extract(text: str):\n"
                f"    front, back = {front!r}, {back!r}\n"
                "    if text.startswith(front) and text.endswith(back):\n"
                "        return text[len(front):len(text) - len(back)].strip()\n"
                "    return ''\n"
            )
        # H5: ISO date lift
        candidates.append(
            "def extract(text: str):\n"
            "    import re\n"
            r"    m = re.search(r'\b\d{4}-\d{2}-\d{2}\b', text)"
            "\n"
            "    return m.group(0) if m else ''\n"
        )
    for code in candidates:
        if samples and _consistent(code, samples):
            return f"```python\n{code}```"
    return "```python\ndef extract(text: str):\n    return ''\n```"


def load_extract_function(code: str):
    """Reference GeminiRun._load_extract_function:151-186: exec the code
    in a namespace preloaded with the allowed stdlib modules, return the
    `extract` callable or None. (No rapidfuzz here — the from-scratch
    functions.fuzzy kernels are the repo's equivalent; inject if a
    generated function needs fuzzy scoring.)"""
    import builtins
    import collections
    import datetime
    import itertools
    import json
    import math
    import string

    code = code.replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
    global_ns = {
        "__builtins__": builtins,
        "__name__": "__main__",
        "re": re,
        "json": json,
        "math": math,
        "datetime": datetime,
        "collections": collections,
        "itertools": itertools,
        "string": string,
    }
    local_ns: dict = {}
    try:
        exec(code, global_ns, local_ns)
    except Exception:
        return None
    fn = local_ns.get("extract") or global_ns.get("extract")
    return fn if callable(fn) else None


def clean_output(text: str) -> str:
    """GeminiRun.clean_outputs:222-228: strip stray code fences."""
    text = text.strip()
    if text.startswith("```"):
        text = text[3:].strip()
    if text.endswith("```"):
        text = text[:-3].strip()
    return text


@dataclass
class CodegenRun:
    """GeminiRun analog (GeminiRun.py:17-65): one escalation round."""

    code_model: Callable[[str], str]
    max_training_size: int = 0
    prompt: str = ""
    code: str = ""
    training_samples: list[CodegenSample] = field(default_factory=list)
    non_used_samples: list[CodegenSample] = field(default_factory=list)
    mistakes_samples: list[CodegenSample] = field(default_factory=list)

    def _update_data_from_previous_run(self, previous: "CodegenRun") -> None:
        # seeded growth: keep the previous round's training set and add up
        # to (cap - len) samples drawn from its MISTAKES (GeminiRun.py:26-43)
        random.seed(42)
        prev_training = previous.training_samples
        to_add = min(
            self.max_training_size - len(prev_training),
            len(previous.mistakes_samples),
        )
        if to_add > 0 and previous.mistakes_samples:
            self.training_samples = prev_training + random.sample(
                previous.mistakes_samples, to_add
            )
        else:
            self.training_samples = prev_training
        in_training = set(self.training_samples)
        self.non_used_samples = [
            s for s in previous.mistakes_samples if s not in in_training
        ]
        self.prompt = build_prompt(self.training_samples)

    def run_training(self, previous: "CodegenRun") -> None:
        if not self.max_training_size:
            return
        self._update_data_from_previous_run(previous)
        if len(self.training_samples) == len(previous.training_samples):
            # nothing new to learn from — inherit (GeminiRun.py:49-52)
            self.mistakes_samples = previous.mistakes_samples
            self.code = previous.code
            return
        self.code = extract_fenced_code(self.code_model(self.prompt))
        predictions = self.run_code(self.non_used_samples)
        self.mistakes_samples = [
            s
            for s, p in zip(self.non_used_samples, predictions)
            if self._is_mistake(p, s)
        ]

    def _is_mistake(self, prediction, sample: CodegenSample) -> bool:
        return prediction.strip() != sample.output.strip()

    def run_code(self, samples: list[CodegenSample]) -> list[str]:
        if not self.code:
            return [""] * len(samples)
        fn = load_extract_function(self.code)
        if fn is None:
            return [""] * len(samples)
        out = []
        for s in samples:
            try:
                r = fn(s.input_text)
                out.append(str(r) if r is not None else "")
            except Exception:
                out.append("")
        return [clean_output(t) for t in out]


def build_prompt_multi(
    samples: list[CodegenSample], options: list[str], multi_value: bool
) -> str:
    """GeminiRunMultiOption prompt shape (GeminiRunMultiOption.py:16-51):
    the allowed-options line plus list-valued example outputs; original
    wording, machine-readable options line."""
    opts = ", ".join(f'"{o}"' for o in options)
    examples = "\n\n".join(
        f"**Example {i}**\nInput:\n```{s.input_text}```\nOutput:\n```{s.output}```"
        for i, s in enumerate(samples, 1)
    )
    single = "" if multi_value else "\n5. Pick at most one option."
    return (
        "**Task**\nInfer which of the allowed options each input maps to "
        "from the examples and implement it.\n"
        f"Allowed options: [{opts}]\n\n"
        f"**Examples**\n{examples}\n\n"
        "**Requirements**\n"
        "1. Define a single Python function `extract(text: str)` returning "
        "a list of option strings.\n"
        "2. Only return options from the allowed set.\n"
        "3. Return an empty list when none apply.\n"
        "4. Return only the function definition in a fenced code block."
        f"{single}\n\n"
        "**Output Format**\n```python\ndef extract(text: str):\n    ...\n```"
    )


_OPTIONS_LINE = re.compile(r"Allowed options: \[(.*?)\]")


def deterministic_code_model_multi(prompt: str) -> str:
    """Multi-option synthesizer for the model slot: parses the allowed
    options and examples back from the prompt and emits a containment
    classifier (the natural analog of the repo's FuzzyAll100) when it
    reproduces every example — else an empty-list function."""
    import ast

    m = _OPTIONS_LINE.search(prompt)
    options = re.findall(r'"([^"]+)"', m.group(1)) if m else []
    single = "Pick at most one option" in prompt
    samples = []
    for inp, out in _EXAMPLE_BLOCK.findall(prompt):
        try:
            parsed = ast.literal_eval(out)
        except (ValueError, SyntaxError):
            parsed = []
        samples.append((inp, parsed if isinstance(parsed, list) else []))
    cap = "[:1]" if single else ""
    code = (
        "def extract(text: str):\n"
        f"    options = {options!r}\n"
        "    lowered = text.lower()\n"
        f"    return [o for o in options if o.lower() in lowered]{cap}\n"
    )
    fn = load_extract_function(code)
    if fn is not None and all(
        sorted(fn(inp)) == sorted(out) for inp, out in samples
    ):
        return f"```python\n{code}```"
    return "```python\ndef extract(text: str):\n    return []\n```"


@dataclass
class CodegenRunMultiOption(CodegenRun):
    """GeminiRunMultiOption analog (GeminiRunMultiOption.py:12-97):
    list-valued outputs, set-compare mistakes, and a coverage-first
    FIRST escalation round (one sample per option before the seeded
    random fill)."""

    options: list[str] = field(default_factory=list)
    multi_value: bool = True

    def _update_data_from_previous_run(self, previous: "CodegenRun") -> None:
        if not previous.training_samples:
            selected: list[CodegenSample] = []
            for option in self.options:
                for s in previous.mistakes_samples:
                    if isinstance(s.output, (list, tuple)) and option in s.output:
                        selected.append(s)
                        break
            remaining = [s for s in previous.mistakes_samples if s not in selected]
            slots = max(0, self.max_training_size - len(selected))
            random.seed(42)
            if slots > 0 and remaining:
                selected += random.sample(remaining, min(slots, len(remaining)))
            self.training_samples = selected
            self.non_used_samples = [
                s for s in previous.mistakes_samples if s not in selected
            ]
            self.prompt = build_prompt_multi(
                self.training_samples, self.options, self.multi_value
            )
        else:
            super()._update_data_from_previous_run(previous)
            self.prompt = build_prompt_multi(
                self.training_samples, self.options, self.multi_value
            )

    def _is_mistake(self, prediction, sample: CodegenSample) -> bool:
        return set(prediction) != set(sample.output)

    def run_code(self, samples: list[CodegenSample]) -> list[list[str]]:
        if not self.code:
            return [[] for _ in samples]
        fn = load_extract_function(self.code)
        if fn is None:
            return [[] for _ in samples]
        out = []
        for s in samples:
            try:
                r = fn(s.input_text)
                out.append(list(r) if isinstance(r, (list, tuple)) else [])
            except Exception:
                out.append([])
        return out


class LlmCodegenTextMethod(MethodBase):
    """M9 slot method (GeminiTextMethod.py:10-48 /OllamaTextMethod shape):
    train runs the 5→15→45 escalation, keeps the code with the fewest
    mistakes; the artifact IS the generated source (the reference
    persists gemini_code.py the same way), so predict is pure code
    execution — distributable as an Arrow-batched pandas kernel with no
    model in the loop. `code_model=None` (no client configured) mirrors
    the reference's missing-API-key gate: can_be_used is False."""

    kind = "to_text"
    ESCALATION = (5, 15, 45)

    def __init__(self, code_model: Callable[[str], str] | None = deterministic_code_model):
        self.code_model = code_model

    def can_be_used(self, train_pdf, ctx) -> bool:
        return self.code_model is not None

    def fit(self, train_pdf, ctx) -> dict[str, Any]:
        if self.code_model is None:
            return {"code": ""}
        all_samples = [
            CodegenSample(
                input_text=" ".join(input_texts_by_lines(row)),
                output=(row.get("label_text") or ""),
            )
            for _, row in train_pdf.iterrows()
        ]
        runs = [CodegenRun(self.code_model, mistakes_samples=all_samples)]
        runs += [CodegenRun(self.code_model, max_training_size=n) for n in self.ESCALATION]
        for previous, current in zip(runs, runs[1:]):
            current.run_training(previous)
            if not current.mistakes_samples:
                break
        with_code = [r for r in runs if r.code]
        if not with_code:
            return {"code": ""}
        best = min(with_code, key=lambda r: len(r.mistakes_samples))
        return {"code": best.code, "prompt": best.prompt}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        run = CodegenRun(self.code_model or (lambda p: ""), code=artifact.get("code", ""))
        samples = [
            CodegenSample(input_text=" ".join(input_texts_by_lines(row)))
            for _, row in pdf.iterrows()
        ]
        return pd.Series(run.run_code(samples), index=pdf.index, dtype=object)


class LlmCodegenMultiOptionMethod(MethodBase):
    """M9 multi-option seat (TextGeminiMultiOption.py:14-69 /
    TextOllamaMultiOption shape): the same synthesis loop with
    list-valued outputs, option-scaled escalation sizes
    (n_options → min(2n,15) → min(4n,45)), and a coverage-first first
    round. The artifact is the generated source; predict executes it
    distributed and maps the returned labels back onto ctx.options
    (first match wins on duplicate labels, Appearance.to_value style)."""

    kind = "multi_option"

    def __init__(
        self,
        code_model: Callable[[str], str] | None = deterministic_code_model_multi,
    ):
        self.code_model = code_model

    def can_be_used(self, train_pdf, ctx) -> bool:
        return self.code_model is not None and bool(getattr(ctx, "options", None))

    def fit(self, train_pdf, ctx) -> dict[str, Any]:
        if self.code_model is None:
            return {"code": ""}
        labels = [o.label for o in ctx.options]
        n = len(labels)
        samples = [
            CodegenSample(
                input_text=" ".join(input_texts_by_lines(row)),
                output=[v["label"] for v in (row.get("values") or [])],
            )
            for _, row in train_pdf.iterrows()
        ]
        sizes = [n, min(2 * n, 15), min(4 * n, 45)]
        runs: list[CodegenRun] = [
            CodegenRunMultiOption(
                self.code_model,
                mistakes_samples=samples,
                options=labels,
                multi_value=ctx.multi_value,
            )
        ]
        runs += [
            CodegenRunMultiOption(
                self.code_model,
                max_training_size=size,
                options=labels,
                multi_value=ctx.multi_value,
            )
            for size in sizes
        ]
        for previous, current in zip(runs, runs[1:]):
            current.run_training(previous)
            if not current.mistakes_samples:
                break
        with_code = [r for r in runs if r.code]
        if not with_code:
            return {"code": ""}
        best = min(with_code, key=lambda r: len(r.mistakes_samples))
        return {"code": best.code, "prompt": best.prompt}

    def predict_pandas(self, pdf, ctx, artifact) -> pd.Series:
        run = CodegenRunMultiOption(
            self.code_model or (lambda p: ""),
            code=artifact.get("code", ""),
            options=[o.label for o in ctx.options],
            multi_value=ctx.multi_value,
        )
        samples = [
            CodegenSample(input_text=" ".join(input_texts_by_lines(row)))
            for _, row in pdf.iterrows()
        ]
        label_to_option = {}
        for o in ctx.options:
            label_to_option.setdefault(o.label, o)
        out = []
        for labels in run.run_code(samples):
            out.append(
                [
                    label_to_option[lab].to_dict() | {"segment_text": None}
                    for lab in labels
                    if lab in label_to_option
                ]
            )
        return pd.Series(out, index=pdf.index, dtype=object)
