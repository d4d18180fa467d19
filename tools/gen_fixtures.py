#!/usr/bin/env python3
"""Deterministic fixture generator (FIXTURES.md).

Generates:
  data/transcripts_t1|t2|bench/transcripts.parquet   -- synthetic input tables
  src/test/resources/expected_t1|t2.parquet          -- golden outputs, frozen
  src/test/resources/smart_resize_cases.tsv
  src/test/resources/cleaner_cases.jsonl
  src/test/resources/formula_cases.jsonl
  src/test/resources/cleantext_cases.jsonl

Golden outputs are produced by executing the REFERENCE's own functions
(/root/reference/dots_ocr/utils/*.py) over the same payloads — the Scala
engine must match them byte-for-byte. The only declared divergence is the
Picture render placeholder (SURVEY.md §7.4.5): PILimage_to_base64 is patched
to `bbox:x1,y1,x2,y2` so `![](bbox:...)` stands in for the base64 crop.

Deterministic: seed=42; per-turn RNG seeded from fnv1a64(conv#turn).
"""
import io
import json
import os
import random
import sys
import types
import contextlib
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# ---------------------------------------------------------------- stubs
for name in ("fitz", "requests", "numpy"):
    sys.modules.setdefault(name, types.ModuleType(name))
tqdm_mod = types.ModuleType("tqdm")
tqdm_mod.tqdm = lambda *a, **k: a[0] if a else None
sys.modules.setdefault("tqdm", tqdm_mod)
# dots_ocr/__init__.py imports parser -> model.inference -> openai; stub chain
openai_mod = types.ModuleType("openai")
class _OAI:
    def __init__(self, *a, **k):
        pass
openai_mod.OpenAI = _OAI
sys.modules.setdefault("openai", openai_mod)
pil = types.ModuleType("PIL")
pil_image = types.ModuleType("PIL.Image")
class _Img:  # only used for isinstance checks we never hit
    pass
pil_image.Image = _Img
pil.Image = pil_image
sys.modules.setdefault("PIL", pil)
sys.modules.setdefault("PIL.Image", pil_image)
pyd = types.ModuleType("pydantic")
class _BM:
    pass
pyd.BaseModel = _BM
pyd.Field = lambda *a, **k: None
sys.modules.setdefault("pydantic", pyd)

sys.path.insert(0, REF)
from dots_ocr.utils.image_utils import smart_resize           # noqa: E402
from dots_ocr.utils import format_transformer as ft           # noqa: E402
from dots_ocr.utils.layout_utils import post_process_output, pre_process_bboxes  # noqa: E402
from dots_ocr.utils.output_cleaner import OutputCleaner       # noqa: E402
from dots_ocr.utils.prompts import dict_promptmode_to_prompt  # noqa: E402

# Picture placeholder patch (declared divergence, SURVEY §7.4.5)
ft.PILimage_to_base64 = lambda crop: "bbox:%d,%d,%d,%d" % crop


class FakeImage:
    def __init__(self, w, h):
        self.width, self.height, self.size = w, h, (w, h)
    def crop(self, box):
        return tuple(box)


# ---------------------------------------------------------------- geometry
# MUST match graft.pipeline.PageGeom (Scala) exactly.
SHAPES = [
    (1650, 1275), (3508, 2480), (1754, 1240), (600, 800),
    (2160, 3840), (3000, 4500), (40, 30), (21, 50),
    (2800, 5000), (1000, 1000), (480, 640), (28, 28),
    (1274, 1246), (14, 2591), (500, 706), (3210, 2140),
]
MASK = (1 << 64) - 1

def fnv1a64(s: str) -> int:
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001b3) & MASK
    return h

def geom(conv_id: str, turn_idx: int):
    return SHAPES[fnv1a64(f"{conv_id}#{turn_idx}") % len(SHAPES)]


def gbox(conv_id: str, turn_idx: int, w: int, h: int):
    """Deterministic grounding bbox in original space — MUST match
    graft.pipeline.Prompts.groundingBbox (Scala)."""
    hv = fnv1a64(f"{conv_id}#{turn_idx}#gbox")
    a, b = hv & 0xFFFF, (hv >> 16) & 0xFFFF
    c, d = (hv >> 32) & 0xFFFF, (hv >> 48) & 0xFFFF
    x1 = a % max(1, w - 40)
    y1 = b % max(1, h - 40)
    return [x1, y1, x1 + 10 + c % 400, y1 + 10 + d % 200]


# ---------------------------------------------------------------- payloads
CATS = ['Caption', 'Footnote', 'Formula', 'List-item', 'Page-footer',
        'Page-header', 'Picture', 'Section-header', 'Table', 'Text', 'Title']
TEXT_POOL = [
    "The quick brown fox jumps over the lazy dog.",
    "Revenue grew **14%** year over year, driven by subscriptions.",
    "# Heading\nSome *markdown* body text with [a link](https://example.org).",
    "数据处理管道在大规模语料上运行良好。",
    "Обработка документов завершена успешно.",
    "ཡིག་ཆ་དབྱེ་ཞིབ་བྱེད་པ།",
    "ಕನ್ನಡ ಪಠ್ಯ ವಿಶ್ಲೇಷಣೆ",
    "مرحبا بالعالم — هذا نص عربي.",
    "Mixed emoji 🙂📄 and ZWJ 👩‍💻 sequence.",
    "\u00a0leading NBSP and trailing NBSP\u00a0",
    "  plain text padded with spaces  ",
    "\u3000ideographic pad\u3000",
    "\u2028line-sep pad\u2028",
    "List item one\nList item two",
    "Footnote¹ with superscript reference.",
]
TABLE_POOL = [
    "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
    "<table><tr><td>单元格</td><td>2</td></tr></table>",
]
FORMULA_POOL = [  # the 7 branches of get_formula_in_markdown (P11)
    "$$E = mc^2$$",                                   # already $$, no inner $
    "$$a^2 + b^2 $ c^2$$",                            # $$ with inner $ → as-is
    "\\[ \\int_0^1 x\\,dx = \\frac{1}{2} \\]",        # \[...\] wrap
    "where \\[x=1\\] holds",                          # embedded \[...\]
    "inline $x+y$ math",                              # inline $...$
    "no latex at all",                                # plain
    "\\usepackage{amsmath} \\frac{a}{b}",             # preamble strip
    "`\\alpha + \\beta`",                             # backticked command
    "\\sum_{i=0}^{n} i",                              # bare command → $$ wrap
]
HF_TEXTS = ["Page 3 of 12", "CONFIDENTIAL — internal use", "© 2026 ACME Corp"]

LAYOUT_MODES = {"prompt_layout_all_en", "prompt_layout_only_en", "prompt_grounding_ocr"}

def mk_cell(rng, iw, ih, cat=None, text=None, extra=None):
    x1 = rng.randrange(0, max(1, iw - 40))
    y1 = rng.randrange(0, max(1, ih - 40))
    x2 = x1 + rng.randrange(10, max(11, min(400, iw - x1)))
    y2 = y1 + rng.randrange(10, max(11, min(200, ih - y1)))
    c = cat or rng.choice(CATS)
    cell = {"bbox": [x1, y1, x2, y2], "category": c}
    if c == "Picture":
        pass  # text omitted per prompt contract
    elif c == "Formula":
        cell["text"] = text if text is not None else rng.choice(FORMULA_POOL)
    elif c == "Table":
        cell["text"] = text if text is not None else rng.choice(TABLE_POOL)
    elif c in ("Page-header", "Page-footer"):
        cell["text"] = text if text is not None else rng.choice(HF_TEXTS)
    else:
        cell["text"] = text if text is not None else rng.choice(TEXT_POOL)
    if extra:
        cell.update(extra)
    return cell

def wellformed(rng, iw, ih, n=None, force_cats=None):
    n = n or rng.randrange(2, 9)
    cells = [mk_cell(rng, iw, ih) for _ in range(n)]
    for c in (force_cats or []):
        cells[rng.randrange(len(cells))] = mk_cell(rng, iw, ih, cat=c)
    return cells

def dumps(cells):
    return json.dumps(cells, ensure_ascii=False)

def make_payload(cls, rng, iw, ih):
    """Returns the `text` column payload for one turn of class `cls`."""
    if cls == "P0":
        cells = wellformed(rng, iw, ih)
        return dumps(cells)
    if cls == "P0hf":  # P10: headers/footers present, md vs md_nohf differ
        cells = wellformed(rng, iw, ih, n=6,
                           force_cats=["Page-header", "Page-footer", "Text"])
        return dumps(cells)
    if cls == "P0formula":  # P11: every formula branch shows up over the corpus
        cells = [mk_cell(rng, iw, ih, cat="Formula",
                         text=FORMULA_POOL[rng.randrange(len(FORMULA_POOL))])
                 for _ in range(rng.randrange(1, 4))]
        cells.append(mk_cell(rng, iw, ih, cat="Text"))
        return dumps(cells)
    if cls == "P0picture":  # P12
        return dumps([mk_cell(rng, iw, ih, cat="Picture"),
                      mk_cell(rng, iw, ih, cat="Caption")])
    if cls == "P0rich":  # P13 + float extra field + odd key order
        c1 = {"category": "Table", "bbox": [10, 20, 300, 200],
              "text": rng.choice(TABLE_POOL), "score": 0.5}
        c2 = {"text": "`$v = at$`", "category": "Text",
              "bbox": [12, 210, 280, 260]}
        c3 = mk_cell(rng, iw, ih, cat="Title")
        return dumps([c1, c2, c3])
    if cls == "P0float":  # float + negative coords: int(float(x)/scale)
        # truncates TOWARD ZERO (not floor) — negative witnesses pin that
        c1 = {"bbox": [10.7, 20.2, 110.9, 220.499], "category": "Text",
              "text": rng.choice(TEXT_POOL)}
        c2 = {"bbox": [-15, -7, 90, 80], "category": "Caption",
              "text": "negative origin crop"}
        c3 = {"bbox": [0.5, 1.5, 33.25, 44.75], "category": "Footnote",
              "text": "halves"}
        return dumps([c1, c2, c3, mk_cell(rng, iw, ih)])
    if cls == "P0illegal":  # P15: x2<=x1 — reference passes them through
        bad = {"bbox": [200, 100, 150, 90], "category": "Text", "text": "inverted"}
        return dumps([bad, mk_cell(rng, iw, ih)])
    if cls == "P1":  # missing delimiters; `{ "` spacing so (?!") can't block
        cells = wellformed(rng, iw, ih, n=4)
        parts = ['{ ' + dumps(c)[1:] for c in cells]  # '{ "bbox": ...'
        return '[' + parts[0] + ' ' + parts[1] + ', ' + parts[2] + ' ' + parts[3] + ']'
    if cls == "P1fs":  # missing delimiters separated by U+001C-class chars:
        # Python \s includes U+001C-001F (Java's Unicode \s does not) — the
        # engine's hand-rolled scanner follows Python; this class pins it
        cells = wellformed(rng, iw, ih, n=3)
        parts = ['{ ' + dumps(c)[1:] for c in cells]
        return '[' + parts[0] + '\x1c' + parts[1] + '\x1e\x1f ' + parts[2] + ']'
    if cls == "P2":  # truncated tail, multiple dicts
        cells = wellformed(rng, iw, ih, n=5)
        s = dumps(cells)
        cut = s.rfind('{"bbox"')
        return s[:cut + rng.randrange(8, 24)]
    if cls == "P2long":  # >50k chars AND invalid (trailing comma) — C4 fires
        cells = [mk_cell(rng, iw, ih, cat="Text",
                         text="lorem ipsum " * 400 + str(i)) for i in range(12)]
        s = dumps(cells)
        assert len(s) > 50000
        return s[:-1] + ',]'
    if cls == "P3":  # duplicate complete dicts + trailing comma (invalid)
        a = mk_cell(rng, iw, ih, cat="Text")
        b = mk_cell(rng, iw, ih, cat="Title")
        return '[' + dumps(a)[1:-1].join(['{', '}']) + ', ' + \
               json.dumps(a, ensure_ascii=False) + ', ' + \
               json.dumps(b, ensure_ascii=False) + ',]'
    if cls == "P4":  # bare concatenated dicts, no array brackets
        a, b = mk_cell(rng, iw, ih), mk_cell(rng, iw, ih)
        return json.dumps(a, ensure_ascii=False) + ', ' + json.dumps(b, ensure_ascii=False)
    if cls == "P5":  # partially-invalid dict amid good ones
        a, b = mk_cell(rng, iw, ih), mk_cell(rng, iw, ih)
        bad = '{"bbox": [5, 6, 70, 80], "category": unquoted}'
        return '[' + json.dumps(a, ensure_ascii=False) + ', ' + bad + ', ' + \
               json.dumps(b, ensure_ascii=False) + ']'
    if cls == "P6":  # single incomplete dict cut mid-text
        t = rng.choice(TEXT_POOL).replace('"', '')
        return '[{"bbox": [%d, %d, %d, %d], "category": "Text", "text": "%s' % (
            rng.randrange(50), rng.randrange(50), 60 + rng.randrange(200),
            70 + rng.randrange(200), t[: rng.randrange(5, max(6, len(t)))])
    if cls == "P7":  # 3-coord bbox in valid JSON → list-path repair
        good = mk_cell(rng, iw, ih, cat="Text")
        three = {"bbox": [10, 20, 30], "category": "Caption", "text": "triplet"}
        return dumps([good, three, mk_cell(rng, iw, ih, cat="Title")])
    if cls == "P8":  # C9 thresholds via string path (trailing comma invalid)
        reps = [{"bbox": [i * 7, 5, i * 7 + 50, 40], "category": "Text",
                 "text": "repeated line"} for i in range(5)]
        dupbox = [{"bbox": [400, 400, 500, 450], "category": "Title", "text": "A"},
                  {"bbox": [400, 400, 500, 450], "category": "Caption", "text": "B"}]
        uniq = mk_cell(rng, iw, ih, cat="Footnote")
        cells = reps + dupbox + [uniq]
        rng.shuffle(cells)
        return dumps(cells)[:-1] + ',]'
    if cls == "P8list":  # C9 via list path (3-coord forces repair)
        dup = {"bbox": [100, 100, 200, 200], "category": "Text", "text": "dup box"}
        three = {"bbox": [1, 2, 3], "category": "Caption", "text": "tri"}
        return dumps([dup, dict(dup, text="other"), three,
                      mk_cell(rng, iw, ih, cat="Title")])
    if cls == "P9":  # unparsable garbage
        return rng.choice([
            "I could not detect any layout elements on this page.",
            "ERROR: timeout while scanning page — partial output only",
            "<<<binary blob 0x%x>>>" % rng.randrange(1 << 30),
        ])
    if cls == "P9scalar":  # valid JSON scalar → str() path in cleaner
        return json.dumps(rng.choice(["just a string", "another response"]))
    if cls == "P9dict":  # valid JSON dict (not list) → str(dict) = repr path
        cell = mk_cell(rng, iw, ih, cat="Text")
        return json.dumps(cell, ensure_ascii=False)
    if cls == "P9dict2":  # dict with repr-stressing values (quotes, escapes,
        # unicode, floats, nested list) → single-quote repr into the ladder
        d = {"bbox": [1.5, -2, 30, 40], "category": "Text",
             "text": "it's got \"both\" quotes\nand\ttabs é中",
             "extra": [1, 2.25, True, None, {"k": "v"}]}
        return json.dumps(d, ensure_ascii=False)
    if cls == "P0mixedkeys":  # C9 numeric key equality: 1 == 1.0 in Python
        # dict keys, so int/float duplicate bboxes dedup together. The
        # 3-coord cell forces the repair path (list mode).
        a = {"bbox": [100, 100, 200, 200], "category": "Text", "text": "int box"}
        b = {"bbox": [100.0, 100.0, 200.0, 200.0], "category": "Title", "text": "float box"}
        three = {"bbox": [1, 2, 3], "category": "Caption", "text": "tri"}
        return dumps([a, three, b, mk_cell(rng, iw, ih, cat="Footnote")])
    if cls == "P0numpair":  # unit-only: numeric (category,text) pair keys —
        # text 7 vs 7.0 count as ONE key (>=5 -> dedup). Never enters the
        # corpus: a kept int text would make the reference's md join raise.
        reps = [{"bbox": [10 * i, 5, 10 * i + 9, 30], "category": "Text", "text": 7}
                for i in range(3)]
        repsf = [{"bbox": [11 * i, 50, 11 * i + 9, 70], "category": "Text", "text": 7.0}
                 for i in range(2)]
        three = {"bbox": [1, 2, 3], "category": "Caption", "text": "tri"}
        return dumps(reps + [three] + repsf)
    if cls == "P0unhashable":  # C9 TypeError: tuple(bbox) with a nested list
        # is unhashable → clean_model_output returns the ORIGINAL list
        good = mk_cell(rng, iw, ih, cat="Text")
        bad = {"bbox": [1, [2], 3, 4], "category": "Caption", "text": "nested"}
        return dumps([good, bad, mk_cell(rng, iw, ih, cat="Title")])
    if cls == "raw":  # P14 payload for non-JSON modes
        return rng.choice(TEXT_POOL) + "\n\n" + rng.choice(TEXT_POOL)
    raise ValueError(cls)


# class mix: ~72% well-formed-ish, rest repair classes (FIXTURES.md §5)
CLASS_WHEEL = (
    ["P0"] * 40 + ["P0hf"] * 8 + ["P0formula"] * 8 + ["P0picture"] * 6 +
    ["P0float"] * 4 +
    ["P0rich"] * 6 + ["P0illegal"] * 2 +
    ["P1"] * 4 + ["P1fs"] * 2 + ["P2"] * 4 + ["P2long"] * 1 + ["P3"] * 4 + ["P4"] * 3 +
    ["P5"] * 3 + ["P6"] * 3 + ["P7"] * 3 + ["P8"] * 2 + ["P8list"] * 2 +
    ["P9"] * 3 + ["P9scalar"] * 1 +
    ["P9dict"] * 2 + ["P9dict2"] * 1 + ["P0mixedkeys"] * 2 + ["P0unhashable"] * 2
)
TOOL_WHEEL = (
    ["prompt_layout_all_en"] * 70 + ["prompt_layout_only_en"] * 10 +
    ["prompt_grounding_ocr"] * 5 + ["prompt_ocr"] * 10 +
    ["prompt_table_html"] * 2 + ["prompt_general"] * 3
)
ROLES = ["user", "assistant", "tool"]
BASE_TS = int(datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc).timestamp())

def conv_lengths(tier, n_convs, rng):
    lens = []
    for j in range(n_convs):
        r = rng.random()
        if r < 0.5:
            lens.append(rng.randrange(1, 6))
        elif r < 0.85:
            lens.append(rng.randrange(6, 20))
        else:
            lens.append(rng.randrange(20, 60))
    # explicit skew: a few very long conversations (salted-repartition witness)
    if tier == "t2":
        lens[0] = 800
    if tier == "bench":
        lens[0], lens[1], lens[2] = 8000, 5000, 3000
    return lens

def gen_tier(tier, n_convs):
    rng0 = random.Random(42 + hash(tier) % 1000)  # only for lengths; stable
    rng0 = random.Random(fnv1a64("tier:" + tier) % (1 << 32))
    lens = conv_lengths(tier, n_convs, rng0)
    rows = []
    for j, ln in enumerate(lens):
        conv = f"{tier}-conv-{j:05d}"
        for k in range(ln):
            rng = random.Random(fnv1a64(f"{conv}#{k}#payload") % (1 << 32))
            tool = TOOL_WHEEL[rng.randrange(len(TOOL_WHEEL))]
            h, w = geom(conv, k)
            ih, iw = smart_resize(h, w)
            if tool in LAYOUT_MODES:
                cls = CLASS_WHEEL[rng.randrange(len(CLASS_WHEEL))]
            else:
                cls = "raw"
            text = make_payload(cls, rng, iw, ih)
            ts = (BASE_TS + (fnv1a64(conv) % 86400) + 37 * k) * 1_000_000
            rows.append((conv, k, ROLES[k % 3], text, tool, ts))
    return rows


# ------------------------------------------------------- expected (golden)
def len16(s):
    return len(s.encode("utf-16-le")) // 2

def render_piece(cell):
    cat = cell["category"]
    if cat == "Picture":
        x1, y1, x2, y2 = [int(c) for c in cell["bbox"]]
        return "![](bbox:%d,%d,%d,%d)" % (x1, y1, x2, y2)
    if cat == "Formula":
        return ft.get_formula_in_markdown(cell.get("text", ""))
    return ft.clean_text(cell.get("text", ""))

def md_and_spans(cells):
    parts, spans, off = [], [], 0
    for i, cell in enumerate(cells):
        piece = render_piece(cell)
        if parts:
            off += 2
        start = off
        off += len16(piece)
        spans.append({"cell_idx": i, "category": cell["category"],
                      "start": start, "end": off})
        parts.append(piece)
    return "\n\n".join(parts), spans

def expected_row(conv, k, role, tool, text):
    h, w = geom(conv, k)
    ih, iw = smart_resize(h, w)
    base = dict(conv_id=conv, turn_idx=k, input_width=iw, input_height=ih,
                cells_json=None, md=None, md_nohf=None, filtered=False,
                spans_json="[]")
    if tool not in LAYOUT_MODES:
        base["md"] = text
        return base
    origin, inp = FakeImage(w, h), FakeImage(w, h)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = post_process_output(text, tool, origin, inp)
    cells, filtered = out
    if not filtered:
        base["cells_json"] = json.dumps(cells, ensure_ascii=False)
        if tool != "prompt_layout_only_en":
            with contextlib.redirect_stdout(io.StringIO()):
                md = ft.layoutjson2md(origin, cells, text_key="text")
                md_nohf = ft.layoutjson2md(origin, cells, text_key="text",
                                           no_page_hf=True)
            md2, spans = md_and_spans(cells)
            assert md2 == md, f"span fold mismatch {conv}#{k}"
            base.update(md=md, md_nohf=md_nohf,
                        spans_json=json.dumps(spans, ensure_ascii=False))
    else:
        base["filtered"] = True
        if tool == "prompt_layout_only_en":
            base["cells_json"] = json.dumps(cells, ensure_ascii=False)
        else:
            base["cells_json"] = json.dumps(text, ensure_ascii=False)
            base["md"] = cells
    return base


def expected_prompt(conv, k, tool):
    """parser.py:133-140 get_prompt, executed via the reference's own
    pre_process_bboxes + prompt dict. Returns None for modes the reference's
    dict does not contain (get_prompt would KeyError)."""
    if tool not in dict_promptmode_to_prompt:
        return None
    prompt = dict_promptmode_to_prompt[tool]
    if tool == "prompt_grounding_ocr":
        h, w = geom(conv, k)
        ih, iw = smart_resize(h, w)
        bbox = gbox(conv, k, w, h)
        pre = pre_process_bboxes(FakeImage(w, h), [bbox],
                                 input_width=iw, input_height=ih)[0]
        prompt = prompt + str(pre)
    return prompt


def write_expected_prompts(rows, path):
    recs = [(c, k, tool, expected_prompt(c, k, tool))
            for (c, k, _r, _t, tool, _ts) in rows]
    recs = [r for r in recs if r[3] is not None]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in recs], pa.string()),
        "turn_idx": pa.array([r[1] for r in recs], pa.int32()),
        "tool": pa.array([r[2] for r in recs], pa.string()),
        "prompt": pa.array([r[3] for r in recs], pa.string()),
    })
    pq.write_table(t, path, row_group_size=4096)
    print(f"expected prompts: {len(recs)} rows -> {path}")


# ---------------------------------------------------------------- writers
def write_transcripts(tier, rows, outdir):
    os.makedirs(outdir, exist_ok=True)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    cols = list(zip(*rows))
    t = pa.table({
        "conv_id": pa.array(cols[0], pa.string()),
        "turn_idx": pa.array(cols[1], pa.int32()),
        "role": pa.array(cols[2], pa.string()),
        "text": pa.array(cols[3], pa.string()),
        "tool": pa.array(cols[4], pa.string()),
        "ts": pa.array(cols[5], pa.timestamp("us")),
    }, schema=schema)
    # bench tier: small row groups so a single file yields enough scan
    # splits to saturate local[32] (row-group count bounds task parallelism)
    rg = 512 if tier == "bench" else 4096
    pq.write_table(t, os.path.join(outdir, "transcripts.parquet"),
                   row_group_size=rg)
    print(f"{tier}: {len(rows)} turns -> {outdir}")

def write_expected(rows, path):
    exp = [expected_row(c, k, r, tool, text) for (c, k, r, text, tool, ts_)
           in [(x[0], x[1], x[2], x[3], x[4], x[5]) for x in rows]]
    t = pa.table({
        "conv_id": pa.array([e["conv_id"] for e in exp], pa.string()),
        "turn_idx": pa.array([e["turn_idx"] for e in exp], pa.int32()),
        "input_width": pa.array([e["input_width"] for e in exp], pa.int32()),
        "input_height": pa.array([e["input_height"] for e in exp], pa.int32()),
        "cells_json": pa.array([e["cells_json"] for e in exp], pa.string()),
        "md": pa.array([e["md"] for e in exp], pa.string()),
        "md_nohf": pa.array([e["md_nohf"] for e in exp], pa.string()),
        "filtered": pa.array([e["filtered"] for e in exp], pa.bool_()),
        "spans_json": pa.array([e["spans_json"] for e in exp], pa.string()),
    })
    pq.write_table(t, path, row_group_size=4096)
    n_filtered = sum(1 for e in exp if e["filtered"])
    print(f"expected: {len(exp)} rows ({n_filtered} filtered) -> {path}")


def write_mm_golden(path):
    """Digest-keyed golden for the multimodal decode stub (MultimodalOps.
    StubCodec): FNV-derived dims/duration/features are not SQL-expressible,
    so this independent Python recompute is the oracle. Keyed by md5(text)
    it works at ANY sf dir; covers every document text across all three."""
    import hashlib
    import struct as st
    texts = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        f = f"/root/testdata/{sf}/documents.parquet"
        if os.path.exists(f):
            t = pq.read_table(f, columns=["text"])
            for s in t.column("text").to_pylist():
                texts[hashlib.md5(s.encode("utf-8")).hexdigest()] = s

    def fnv_seed(b, seed):
        h = (0xcbf29ce484222325 ^ seed) & MASK
        for x in b:
            h ^= x
            h = (h * 0x100000001b3) & MASK
        return h

    recs = []
    for md5h, s in sorted(texts.items()):
        b = s.encode("utf-8")
        h1 = fnv_seed(b, 1)
        w = 320 + h1 % 3520
        hh = 240 + (h1 >> 17) % 1920
        dur = 1000 + fnv_seed(b, 2) % 599000
        rh, rw = smart_resize(hh, w)
        nf = (dur + 9999) // 10000  # len(0 until dur by 10000)
        sq = 0.0
        for i in range(16):
            hx = fnv_seed(b, 100 + i)
            if hx >= 1 << 63:
                hx -= 1 << 64  # to signed, like Scala Long
            f32 = st.unpack("f", st.pack("f", float(hx) / float((1 << 63) - 1)))[0]
            sq += f32 * f32
        recs.append((md5h, w, hh, dur, rw, rh, nf, sq))
    t = pa.table({
        "content_md5": pa.array([r[0] for r in recs], pa.string()),
        "width": pa.array([r[1] for r in recs], pa.int32()),
        "height": pa.array([r[2] for r in recs], pa.int32()),
        "duration_ms": pa.array([r[3] for r in recs], pa.int64()),
        "resized_width": pa.array([r[4] for r in recs], pa.int32()),
        "resized_height": pa.array([r[5] for r in recs], pa.int32()),
        "n_frames": pa.array([r[6] for r in recs], pa.int32()),
        "feature_sq_norm": pa.array([r[7] for r in recs], pa.float64()),
    })
    pq.write_table(t, path, row_group_size=4096)
    print(f"mm golden: {len(recs)} digests -> {path}")


def write_unit_fixtures(resdir):
    os.makedirs(resdir, exist_ok=True)
    # smart_resize over every branch + banker's ties + errors
    cases = []
    dims = [(1650, 1275), (3508, 2480), (3000, 4500), (40, 30), (21, 50),
            (1274, 1246), (14, 2591), (28, 28), (1, 1), (56, 11200),
            (2800, 5000), (600, 800), (42, 42), (70, 70), (99, 99),
            (140, 28), (1400, 7), (201, 1), (500, 100001), (3136, 3600),
            (27, 27), (29, 29), (4200, 2688), (10000, 1129), (11296, 999)]
    for (hh, ww) in dims:
        try:
            r = smart_resize(hh, ww)
            cases.append(f"{hh}\t{ww}\t{r[0]}\t{r[1]}")
        except Exception:
            cases.append(f"{hh}\t{ww}\tERROR\tERROR")
    with open(os.path.join(resdir, "smart_resize_cases.tsv"), "w") as f:
        f.write("\n".join(cases) + "\n")

    # cleaner: raw payload -> clean_model_output result
    rng = random.Random(4242)
    recs = []
    for cls in ["P1", "P1fs", "P2", "P2long", "P3", "P4", "P5", "P6", "P7",
                "P8", "P8list", "P9", "P9scalar", "P0", "P0mixedkeys",
                "P0numpair", "P0unhashable"]:
        LIST_CLS = ("P7", "P8list", "P0", "P0mixedkeys", "P0numpair",
                    "P0unhashable")
        for rep in range(3):
            payload = make_payload(cls, random.Random(rng.randrange(1 << 30)),
                                   1232, 1652)
            cleaner = OutputCleaner()
            with contextlib.redirect_stdout(io.StringIO()):
                if cls in LIST_CLS:
                    # list path: parsed JSON list like post_process_output does
                    out = cleaner.clean_model_output(json.loads(payload))
                else:
                    out = cleaner.clean_model_output(payload)
            if isinstance(out, list):
                rec = {"name": f"{cls}_{rep}", "mode": "list" if cls in LIST_CLS else "str",
                       "input": payload, "output": json.dumps(out, ensure_ascii=False)}
            else:
                rec = {"name": f"{cls}_{rep}", "mode": "str", "input": payload,
                       "output_passthrough": out}
            recs.append(rec)
    with open(os.path.join(resdir, "cleaner_cases.jsonl"), "w") as f:
        for r in recs:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")

    # formula branches
    extra = ["$$x$$", "$$$", "$$", "  \\[a\\] ", "text $a$ and $b$ text",
             "\\documentclass{article}\\usepackage[utf8]{inputenc}\\begin{document}x=1\\end{document}",
             "`$z$`", "\\begin{align}a&=b\\end{align}", "plain",
             " $$\\pi$$ "]
    with open(os.path.join(resdir, "formula_cases.jsonl"), "w") as f:
        for t in FORMULA_POOL + extra:
            f.write(json.dumps({"input": t, "output": ft.get_formula_in_markdown(t)},
                               ensure_ascii=False) + "\n")

    # clean_text
    ct = ["  hi  ", "`$x$`", "`$`", "", "\u00a0nbsp\u00a0", "`$a$` tail",
          "\u2028ls\u2028", "		tabs	", "\u3000cjk\u3000", "\u001c\u001dfs\u001e\u001f"]
    with open(os.path.join(resdir, "cleantext_cases.jsonl"), "w") as f:
        for t in ct:
            f.write(json.dumps({"input": t, "output": ft.clean_text(t)},
                               ensure_ascii=False) + "\n")
    print(f"unit fixtures -> {resdir}")


def main():
    res = os.path.join(REPO, "src", "test", "resources")
    t1 = gen_tier("t1", 120)      # ~1.2k turns
    t2 = gen_tier("t2", 700)      # ~8-10k turns (+1 conv of 800)
    bench = gen_tier("bench", 6000)  # ~80k + 16k skew turns
    write_transcripts("t1", t1, os.path.join(REPO, "data", "transcripts_t1"))
    write_transcripts("t2", t2, os.path.join(REPO, "data", "transcripts_t2"))
    write_transcripts("bench", bench, os.path.join(REPO, "data", "transcripts_bench"))
    write_expected(t1, os.path.join(res, "expected_t1.parquet"))
    write_expected(t2, os.path.join(res, "expected_t2.parquet"))
    write_expected_prompts(t2, os.path.join(res, "expected_prompts_t2.parquet"))
    write_mm_golden(os.path.join(res, "mm_decoded_golden.parquet"))
    write_unit_fixtures(res)


if __name__ == "__main__":
    main()
