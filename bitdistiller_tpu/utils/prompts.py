"""Prompt templates for chat/instruction models.

Parity with inference/utils/prompt_templates.py:11-251 (role-based templates
per model family) condensed to a registry of format functions.
"""

from __future__ import annotations

TEMPLATES = {
    "raw": lambda sys, user: user,
    "llama2": lambda sys, user: (
        f"[INST] <<SYS>>\n{sys}\n<</SYS>>\n\n{user} [/INST]"
        if sys
        else f"[INST] {user} [/INST]"
    ),
    "alpaca": lambda sys, user: (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{user}\n\n### Response:\n"
    ),
    "vicuna": lambda sys, user: (
        (sys or "A chat between a curious user and an artificial intelligence assistant.")
        + f" USER: {user} ASSISTANT:"
    ),
    "metamath": lambda sys, user: (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{user}\n\n### Response: Let's think step by step."
    ),
    "chatml": lambda sys, user: (
        (f"<|im_start|>system\n{sys}<|im_end|>\n" if sys else "")
        + f"<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n"
    ),
    # falcon-instruct dialogue format (FalconPrompter, prompt_templates.py:174)
    "falcon": lambda sys, user: (
        (f"{sys}\n" if sys else "") + f"User: {user}\nAssistant:"
    ),
    # mpt-chat uses ChatML with mosaic's default system line
    # (MPTChatPrompter, prompt_templates.py:201)
    "mpt-chat": lambda sys, user: (
        "<|im_start|>system\n"
        + (sys or "A conversation between a user and an LLM-based AI assistant.")
        + "<|im_end|>\n"
        + f"<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n"
    ),
    # wizardcoder-style code instruction (data_utils.py code prompt family)
    "code": lambda sys, user: (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{user}\n\n### Response:"
    ),
}


def render_prompt(template: str, user: str, system: str = "") -> str:
    if template not in TEMPLATES:
        raise ValueError(f"unknown template {template!r}; options: {sorted(TEMPLATES)}")
    return TEMPLATES[template](system, user)
