"""Generate the checked-in offline eval fixtures (fixtures/ at repo root).

Deterministic; re-running reproduces the same files. Provenance per file is
documented in fixtures/README.md (written by this script). The fixtures let
`cli eval / ppl / gsm8k / humaneval` run end-to-end with zero network via
BITDISTILLER_DATA_DIR (see bitdistiller_tpu/data/offline.py) — they are
harness-exercise data, NOT benchmark-grade task data (except the GSM8K
slice, which is real test data vendored by the reference repo).
"""

from __future__ import annotations

import glob
import json
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(ROOT, "fixtures")

REF_GSM8K = "/root/reference/test/gsm8k/test_use.jsonl"
LICENSE_DIR = "/usr/share/common-licenses"


def write_jsonl(name: str, rows: list) -> None:
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"{name}: {len(rows)} rows")


def gsm8k_slice(n=200):
    """Real GSM8K test rows: first n of the reference's vendored
    test/gsm8k/test_use.jsonl (query/response with '#### n' answers)."""
    if not os.path.exists(REF_GSM8K):
        print("reference gsm8k file missing; skipping")
        return
    rows = [json.loads(x) for x in open(REF_GSM8K)][:n]
    write_jsonl("gsm8k_test200.jsonl", rows)


def wikitext_like():
    """English prose rows in the wikitext schema ({'text': line}) built from
    the OS's common-license texts — real natural-language English available
    in every zero-egress image. Exercises the tokenize/join/block PPL path;
    the PPL VALUE is not comparable to real wikitext-2."""
    lines = []
    for path in sorted(glob.glob(f"{LICENSE_DIR}/*")):
        if os.path.isdir(path):
            continue
        name = os.path.basename(path)
        lines.append({"text": f" = {name} = \n"})
        for para in open(path, errors="replace").read().split("\n\n"):
            para = " ".join(para.split())
            if len(para) > 80:
                lines.append({"text": para + "\n"})
        lines.append({"text": ""})
    write_jsonl("wikitext__wikitext-2-raw-v1__test.jsonl", lines)


def mmlu_elementary_math():
    """Synthetic (programmatically generated, answers exact) arithmetic MCQs
    in the cais/mmlu schema: question, choices[4], answer (int)."""
    rng = random.Random(0)
    rows = []
    for _ in range(45):
        kind = rng.randrange(4)
        if kind == 0:
            a, b = rng.randrange(12, 99), rng.randrange(12, 99)
            q, ans = f"What is {a} + {b}?", a + b
        elif kind == 1:
            a, b = rng.randrange(30, 99), rng.randrange(2, 29)
            q, ans = f"What is {a} - {b}?", a - b
        elif kind == 2:
            a, b = rng.randrange(3, 13), rng.randrange(3, 13)
            q, ans = f"What is {a} times {b}?", a * b
        else:
            b = rng.randrange(2, 12)
            ans = rng.randrange(3, 12)
            q = f"What is {ans * b} divided by {b}?"
        deltas = rng.sample([-10, -3, -2, -1, 1, 2, 3, 10], 3)
        choices = [str(ans)] + [str(ans + d) for d in deltas]
        rng.shuffle(choices)
        rows.append({"question": q, "choices": choices,
                     "answer": choices.index(str(ans))})
    write_jsonl("cais_mmlu__elementary_mathematics__dev.jsonl", rows[:5])
    write_jsonl("cais_mmlu__elementary_mathematics__test.jsonl", rows[5:])


def mmlu_abstract_algebra():
    """Synthetic modular-arithmetic MCQs (answers exact), mmlu schema."""
    rng = random.Random(1)
    rows = []
    for _ in range(30):
        m = rng.choice([5, 7, 11, 13])
        a, b = rng.randrange(1, m), rng.randrange(1, m)
        kind = rng.randrange(2)
        if kind == 0:
            q = f"Compute ({a} + {b}) mod {m}."
            ans = (a + b) % m
        else:
            q = f"Compute ({a} * {b}) mod {m}."
            ans = (a * b) % m
        wrong = [x for x in range(m) if x != ans]
        choices = [str(ans)] + [str(x) for x in rng.sample(wrong, 3)]
        rng.shuffle(choices)
        rows.append({"question": q, "choices": choices,
                     "answer": choices.index(str(ans))})
    write_jsonl("cais_mmlu__abstract_algebra__dev.jsonl", rows[:5])
    write_jsonl("cais_mmlu__abstract_algebra__test.jsonl", rows[5:])


ARC_QUESTIONS = [
    ("Which state of matter has a fixed shape and a fixed volume?",
     ["solid", "liquid", "gas", "plasma"], "A"),
    ("What gas do plants absorb from the air for photosynthesis?",
     ["oxygen", "carbon dioxide", "nitrogen", "hydrogen"], "B"),
    ("Which planet is closest to the Sun?",
     ["Venus", "Earth", "Mercury", "Mars"], "C"),
    ("Water boils at what temperature at sea level?",
     ["50 degrees Celsius", "75 degrees Celsius",
      "100 degrees Celsius", "150 degrees Celsius"], "C"),
    ("Which organ pumps blood through the human body?",
     ["the lungs", "the heart", "the liver", "the brain"], "B"),
    ("What force pulls objects toward the center of the Earth?",
     ["magnetism", "friction", "gravity", "inertia"], "C"),
    ("Which of these is a renewable energy source?",
     ["coal", "natural gas", "oil", "wind"], "D"),
    ("What is the main source of energy for Earth's weather systems?",
     ["the Moon", "the Sun", "volcanoes", "ocean currents"], "B"),
    ("Which instrument is used to measure air temperature?",
     ["barometer", "thermometer", "anemometer", "hygrometer"], "B"),
    ("An animal that eats only plants is called a what?",
     ["carnivore", "omnivore", "herbivore", "decomposer"], "C"),
    ("Which process turns liquid water into water vapor?",
     ["condensation", "evaporation", "precipitation", "freezing"], "B"),
    ("What do we call molten rock that reaches the Earth's surface?",
     ["magma", "lava", "granite", "sediment"], "B"),
    ("Which part of a plant absorbs water from the soil?",
     ["leaves", "flowers", "roots", "stem"], "C"),
    ("Sound travels fastest through which medium?",
     ["a vacuum", "air", "water", "steel"], "D"),
    ("Which simple machine is a ramp?",
     ["lever", "pulley", "inclined plane", "wheel and axle"], "C"),
    ("What is the smallest unit of a chemical element?",
     ["a molecule", "an atom", "a cell", "a proton"], "B"),
    ("Which blood cells help the human body fight infection?",
     ["red blood cells", "white blood cells", "platelets", "plasma"], "B"),
    ("The Moon shines because it does what?",
     ["produces its own light", "reflects sunlight",
      "burns gases", "absorbs starlight"], "B"),
    ("Which weather event forms over warm ocean water?",
     ["blizzard", "tornado", "hurricane", "drought"], "C"),
    ("What happens to most metals when they are heated?",
     ["they contract", "they expand", "they melt instantly",
      "they become magnetic"], "B"),
]


def arc_challenge_like():
    """Hand-written basic-science MCQs (answers verified by construction) in
    the ai2_arc schema: question, choices{text, label}, answerKey."""
    rows = []
    for q, texts, key in ARC_QUESTIONS:
        rows.append({
            "question": q,
            "choices": {"text": texts, "label": ["A", "B", "C", "D"]},
            "answerKey": key,
        })
    write_jsonl("ai2_arc__ARC-Challenge__test.jsonl", rows)


HUMANEVAL_MINI = [
    {
        "task_id": "Mini/0",
        "prompt": 'def add(a, b):\n    """Return the sum of a and b."""\n',
        "entry_point": "add",
        "test": "def check(f):\n    assert f(1, 2) == 3\n    assert f(-1, 1) == 0\n    assert f(0, 0) == 0\n",
    },
    {
        "task_id": "Mini/1",
        "prompt": 'def is_even(n):\n    """Return True if n is even."""\n',
        "entry_point": "is_even",
        "test": "def check(f):\n    assert f(2) is True\n    assert f(3) is False\n    assert f(0) is True\n",
    },
    {
        "task_id": "Mini/2",
        "prompt": 'def reverse_string(s):\n    """Return s reversed."""\n',
        "entry_point": "reverse_string",
        "test": "def check(f):\n    assert f('abc') == 'cba'\n    assert f('') == ''\n",
    },
    {
        "task_id": "Mini/3",
        "prompt": 'def maximum(xs):\n    """Return the largest element of the non-empty list xs."""\n',
        "entry_point": "maximum",
        "test": "def check(f):\n    assert f([1, 5, 3]) == 5\n    assert f([-2, -7]) == -2\n",
    },
    {
        "task_id": "Mini/4",
        "prompt": 'def count_vowels(s):\n    """Return the number of vowels (aeiou) in s."""\n',
        "entry_point": "count_vowels",
        "test": "def check(f):\n    assert f('hello') == 2\n    assert f('xyz') == 0\n",
    },
    {
        "task_id": "Mini/5",
        "prompt": 'def factorial(n):\n    """Return n! for n >= 0."""\n',
        "entry_point": "factorial",
        "test": "def check(f):\n    assert f(0) == 1\n    assert f(5) == 120\n",
    },
    {
        "task_id": "Mini/6",
        "prompt": 'def fib(n):\n    """Return the n-th Fibonacci number, fib(0) == 0, fib(1) == 1."""\n',
        "entry_point": "fib",
        "test": "def check(f):\n    assert f(0) == 0\n    assert f(1) == 1\n    assert f(10) == 55\n",
    },
    {
        "task_id": "Mini/7",
        "prompt": 'def unique_sorted(xs):\n    """Return the sorted unique elements of xs as a list."""\n',
        "entry_point": "unique_sorted",
        "test": "def check(f):\n    assert f([3, 1, 3, 2]) == [1, 2, 3]\n    assert f([]) == []\n",
    },
]


def humaneval_mini():
    write_jsonl("humaneval_mini.jsonl", HUMANEVAL_MINI)


def gsm8k_hub_format(n=105):
    """The same REAL reference-vendored GSM8K rows re-shaped into the hub
    gsm8k/main schema ({question, answer}) for the lm-eval-style generative
    task (eval/tasks.py GEN_TASKS['gsm8k'])."""
    if not os.path.exists(REF_GSM8K):
        print("reference gsm8k file missing; skipping")
        return
    rows = [json.loads(x) for x in open(REF_GSM8K)][:n]
    write_jsonl(
        "gsm8k__main__test.jsonl",
        [{"question": r["query"], "answer": r["response"]} for r in rows],
    )


TRIVIA_QA = [
    ("How many sides does a hexagon have?", "six", ["6", "six"]),
    ("What is the chemical symbol for gold?", "Au", ["au"]),
    ("How many days are there in a leap year?", "366", ["366"]),
    ("What is the capital of France?", "Paris", ["paris"]),
    ("How many minutes are there in two hours?", "120", ["120", "one hundred twenty"]),
    ("What planet is known as the Red Planet?", "Mars", ["mars"]),
    ("How many legs does a spider have?", "eight", ["8", "eight"]),
    ("What is the largest ocean on Earth?", "the Pacific Ocean",
     ["pacific", "pacific ocean", "the pacific ocean"]),
    ("What is the square root of 81?", "9", ["9", "nine"]),
    ("How many continents are there on Earth?", "seven", ["7", "seven"]),
    ("What gas makes up most of Earth's atmosphere?", "nitrogen", ["nitrogen"]),
    ("How many strings does a standard violin have?", "four", ["4", "four"]),
    ("What is the freezing point of water in degrees Celsius?", "0",
     ["0", "zero", "0 degrees"]),
    ("How many colors are there in a rainbow?", "seven", ["7", "seven"]),
    ("What is the largest mammal on Earth?", "the blue whale",
     ["blue whale", "the blue whale"]),
    ("How many hours are there in three days?", "72", ["72", "seventy two"]),
]


def triviaqa_like():
    """Hand-written general-knowledge Q/A (answers verified by construction)
    in the hub trivia_qa rc.nocontext schema: question + answer{value,
    aliases}. Schema-faithful; scores are not TriviaQA scores."""
    rows = [
        {"question": q, "answer": {"value": v, "aliases": [v] + extra}}
        for q, v, extra in TRIVIA_QA
    ]
    write_jsonl("trivia_qa__rc.nocontext__validation.jsonl", rows)


def logiqa_like():
    """Hand-written deductive-reasoning MCQs in the reference lm-eval logiqa
    schema (context/question/options/label-letter, tasks/logiqa.py:56-80).
    Schema-faithful; scores are not LogiQA scores."""
    rows = [
        {
            "context": "All cats are mammals. Whiskers is a cat.",
            "question": "Which statement must be true?",
            "options": [
                "Whiskers is a mammal.", "Whiskers is a reptile.",
                "Some mammals are not cats.", "Whiskers is not an animal.",
            ],
            "label": "a",
        },
        {
            "context": "If it rains, the ground gets wet. The ground is dry.",
            "question": "What can be concluded?",
            "options": [
                "It rained.", "It did not rain.",
                "The ground is wet.", "Nothing can be concluded.",
            ],
            "label": "b",
        },
        {
            "context": ("Ann is taller than Ben. Ben is taller than Cal."),
            "question": "Who is the shortest?",
            "options": ["Ann", "Ben", "Cal", "Cannot be determined"],
            "label": "c",
        },
        {
            "context": ("Every member of the chess club also joined the math "
                        "club. Dana did not join the math club."),
            "question": "Which statement must be true?",
            "options": [
                "Dana joined the chess club.",
                "Dana is in the math club.",
                "Everyone in the math club plays chess.",
                "Dana is not in the chess club.",
            ],
            "label": "d",
        },
    ]
    write_jsonl("logiqa__default__test.jsonl", rows)


def mathqa_like():
    """Arithmetic MCQs with exact answers in the hub math_qa schema
    (Problem / packed 'a ) ...' options string / correct letter —
    tasks/mathqa.py:51-63 parses choices out of the packed string).
    Schema-faithful; scores are not MathQA scores."""
    rows = []
    for i, (a, b) in enumerate([(12, 7), (25, 14), (31, 9), (44, 18), (53, 27)]):
        correct = a + b
        opts = [correct - 2, correct - 1, correct, correct + 1, correct + 3]
        letter = "c"
        packed = (f"a ) {opts[0]} , b ) {opts[1]} , c ) {opts[2]} , "
                  f"d ) {opts[3]} , e ) {opts[4]}")
        rows.append({
            "Problem": f"what is {a} + {b} ?",
            "options": packed,
            "correct": letter,
        })
    write_jsonl("math_qa__default__test.jsonl", rows)


def race_like():
    """Short reading passages in the hub race/high schema (one row per
    QUESTION; article/question/options/answer-letter — the task loader
    collates rows per article, tasks/race.py:55-137). Two questions share
    the first article so the collation path is exercised.
    Schema-faithful; scores are not RACE scores."""
    art1 = ("Tom walked to the market on Saturday morning. He bought three "
            "apples and a loaf of bread, then met his friend Sara near the "
            "fountain. They talked for an hour before Tom went home.")
    art2 = ("The town library opens at nine and closes at five. On Fridays "
            "it stays open two hours longer for the evening reading club.")
    rows = [
        {
            "article": art1,
            "question": "What did Tom buy at the market?",
            "options": [
                "Three apples and a loaf of bread", "A basket of pears",
                "Two fish", "Nothing",
            ],
            "answer": "A",
        },
        {
            "article": art1,
            "question": "Who did Tom meet near the fountain?",
            "options": ["His teacher", "His brother", "Sara", "Nobody"],
            "answer": "C",
        },
        {
            "article": art2,
            "question": "When does the library close on Fridays?",
            "options": ["At five", "At nine", "At noon", "At seven"],
            "answer": "D",
        },
    ]
    write_jsonl("race__high__test.jsonl", rows)


README = """\
# Offline eval fixtures

Frozen data slices so `cli eval / ppl / gsm8k / humaneval` run end-to-end
with zero network (the reference's precedent: its vendored offline dataset
builders under test/general/lm_eval/datasets/). Hub-shaped files are served
through `BITDISTILLER_DATA_DIR` (bitdistiller_tpu/data/offline.py); the
rest feed the CLIs' `--data_path` flags. Regenerate with
`python scripts/make_fixtures.py`.

Provenance / honesty notes:

- `gsm8k_test200.jsonl` — REAL GSM8K test rows: the first 200 of the
  reference repo's vendored test/gsm8k/test_use.jsonl (MIT-licensed
  GSM8K data). Accuracy on this slice is a real (small-sample) GSM8K score.
- `wikitext__wikitext-2-raw-v1__test.jsonl` — real English prose from the
  OS's /usr/share/common-licenses texts in the wikitext row schema.
  Exercises the tokenize/join/block PPL path; the resulting perplexity is
  NOT comparable to true wikitext-2 numbers.
- `cais_mmlu__{elementary_mathematics,abstract_algebra}__{dev,test}.jsonl` —
  synthetic MCQs generated programmatically with exact answers (arithmetic /
  modular arithmetic). Schema-faithful; scores are not MMLU scores.
- `ai2_arc__ARC-Challenge__test.jsonl` — hand-written basic-science MCQs in
  the ai2_arc schema. Schema-faithful; scores are not ARC scores.
- `humaneval_mini.jsonl` — 8 original tiny programming problems with
  executable test suites (exercises generation + the rlimit-guarded runner).
- `gsm8k__main__test.jsonl` — the same REAL reference-vendored GSM8K rows
  (first 105) in the hub gsm8k/main schema, for the lm-eval-style
  generative task registry.
- `trivia_qa__rc.nocontext__validation.jsonl` — hand-written general-
  knowledge Q/A with alias lists in the hub trivia_qa schema.
  Schema-faithful; scores are not TriviaQA scores.
- `logiqa__default__test.jsonl` / `math_qa__default__test.jsonl` /
  `race__high__test.jsonl` — hand-written rows with verified answers in
  the respective hub/lm-eval schemas (mathqa's packed options string,
  race's one-row-per-question collation). Schema-faithful; scores are
  not LogiQA/MathQA/RACE scores.
"""


def main():
    os.makedirs(OUT, exist_ok=True)
    gsm8k_slice()
    wikitext_like()
    mmlu_elementary_math()
    mmlu_abstract_algebra()
    arc_challenge_like()
    humaneval_mini()
    gsm8k_hub_format()
    triviaqa_like()
    logiqa_like()
    mathqa_like()
    race_like()
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write(README)
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
