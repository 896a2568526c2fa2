"""Deterministic synthetic corpus generator (FIXTURES.md §2).

Generates the three document grammars from the reference's fixture shapes
(slov-lex HTML law — /root/reference/collections/dane/595_2003/; PDF-like
fragmented annex — annex_processor.py:1031-1209; docling-JSON stream —
document.py:2533-2564) as `(doc_id, spans)` rows. Seeded → byte-identical
across runs and parallelism levels; heavy-tailed sizes to exercise skew
handling (FIXTURES.md §5).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

from docling_spark.functions.textnorm import encode_geometry

Span = Dict[str, object]

_VOCAB = (
    "zákon upravuje podmienky daňovej povinnosti právnickej osoby a fyzickej "
    "osoby pri výkone činnosti na území štátu vrátane príjmov zo závislej "
    "činnosti podnikania prenájmu a použitia diela pričom základ dane sa "
    "zistí ako súčet čiastkových základov znížený o daňovú stratu"
).split()

_PART_NAMES = [
    "PRVÁ ČASŤ", "DRUHÁ ČASŤ", "TRETIA ČASŤ", "ŠTVRTÁ ČASŤ", "PIATA ČASŤ",
    "ŠIESTA ČASŤ", "SEDMÁ ČASŤ", "ÔSMA ČASŤ", "DEVÄTÁ ČASŤ", "DESIATA ČASŤ",
]
_PART_TITLES = [
    "ZÁKLADNÉ USTANOVENIA", "DAŇ FYZICKEJ OSOBY", "DAŇ PRÁVNICKEJ OSOBY",
    "SPOLOČNÉ USTANOVENIA", "PRECHODNÉ USTANOVENIA",
]
_PARA_TITLES = [
    "Predmet úpravy", "Základné pojmy", "Predmet dane", "Oslobodenie od dane",
    "Základ dane", "Sadzba dane", "Daňové priznanie", "Zdaňovacie obdobie",
]
_ITEM_NOUNS = [
    "Budovy", "Stroje", "Zariadenia", "Softvér", "Dopravné prostriedky",
    "Prístroje", "Nástroje", "Konštrukcie", "Siete", "Pece",
]


def _sentence(rng: random.Random, lo: int = 6, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_VOCAB) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _encode_win1250(text: str, rng: random.Random) -> str:
    """Randomly /c-encode the non-ASCII chars of a string (the reference's
    custom-font PDF encoding, sequential_parser.py:977-1092 inverse)."""
    from docling_spark.functions.textnorm import _WIN1250_OVERRIDE

    rev = {v: k for k, v in _WIN1250_OVERRIDE.items()}
    out = []
    for ch in text:
        if ord(ch) > 127 and rng.random() < 0.8:
            code = rev.get(ch, ord(ch))
            out.append(f"/c{code}")
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# 2a — slov-lex-shaped HTML law
# ---------------------------------------------------------------------------


def synth_html_law(doc_id: str, rng: random.Random, mega: bool = False) -> List[Span]:
    law_no = rng.randint(1, 999)
    year = rng.randint(1993, 2025)
    n_parts = rng.randint(2, 4) if not mega else rng.randint(6, 10)
    paras_per_part = (1, 3) if not mega else (12, 25)

    h: List[str] = []
    h.append(
        f"<html><head><title>Zákon č. {law_no}/{year} Z. z. o dani"
        f"</title></head><body>"
    )
    # furniture: portal chrome (stripped downstream — F13)
    h.append(
        '<div class="menu"><span>button-search</span><span>button-print</span></div>'
    )

    para_no = 0
    for p in range(n_parts):
        part_title = _PART_TITLES[p % len(_PART_TITLES)]
        h.append(
            f'<div class="cast"><div class="castOznacenie">{_PART_NAMES[p]}</div>'
            f'<div class="castNadpis">{part_title}</div></div>'
        )
        for _ in range(rng.randint(*paras_per_part)):
            para_no += 1
            pid = f"paragraf-{para_no}"
            title = rng.choice(_PARA_TITLES)
            h.append(f'<div class="paragraf" id="{pid}">')
            h.append(
                f'<div class="paragrafOznacenie"><a href="#{pid}">§ {para_no}</a></div>'
            )
            if rng.random() < 0.8:
                h.append(f'<div class="paragrafNadpis">{title}</div>')
            embedded = rng.random() < 0.1  # intro with embedded pismenos, no odsek divs
            if embedded:
                intro = (
                    _sentence(rng)
                    + " a) "
                    + _sentence(rng, 4, 8)
                    + " b) "
                    + _sentence(rng, 4, 8)
                )
                h.append(f'<div class="text">{intro}</div>')
            else:
                for o in range(1, rng.randint(1, 4) + 1):
                    oid = f"{pid}.odsek-{o}"
                    h.append(f'<div class="odsek" id="{oid}">')
                    h.append(
                        f'<div class="odsekOznacenie"><a href="#{oid}">({o})</a></div>'
                    )
                    h.append(f'<div class="text">{_sentence(rng)}</div>')
                    n_pis = rng.randint(0, 3)
                    for letter_i in range(n_pis):
                        letter = chr(ord("a") + letter_i)
                        lid = f"{oid}.pismeno-{letter}"
                        h.append(f'<div class="pismeno" id="{lid}">')
                        h.append(
                            f'<div class="pismenoOznacenie">'
                            f'<a href="#{lid}">{letter})</a></div>'
                        )
                        h.append(f'<div class="text">{_sentence(rng, 4, 10)}</div>')
                        for b in range(1, rng.randint(0, 2) + 1):
                            h.append(
                                f'<div class="bod"><div class="bodOznacenie">{b}.'
                                f'</div><div class="text">{_sentence(rng, 3, 7)}</div></div>'
                            )
                        h.append("</div>")
                    if rng.random() < 0.15:
                        h.append(
                            f'<div class="text">Postup podľa '
                            f'<a href="#paragraf-{max(1, para_no - 1)}">'
                            f"§ {max(1, para_no - 1)} ods. 1</a> sa použije primerane."
                            f"</div>"
                        )
                    h.append("</div>")
            h.append("</div>")

    # law-end marker (F6) then annexes then footnotes
    h.append(
        f'<div class="clanok">Tento zákon nadobúda účinnosť 1. januára {year + 1}.'
        f"</div>"
    )
    n_annex = rng.randint(0, 2)
    for k in range(1, n_annex + 1):
        h.append(
            f'<div class="priloha"><div class="prilohaOznacenie">'
            f"Príloha č. {k} k zákonu č. {law_no}/{year} Z. z.</div>"
            f'<div class="text">{_sentence(rng)}</div></div>'
        )
    n_foot = rng.randint(0, 3)
    if n_foot:
        h.append('<div id="poznamky"><div class="nadpis"><a href="#poznamky">Poznámky</a></div>')
        for f in range(1, n_foot + 1):
            h.append(
                f'<div class="poznamka"><div class="poznamkaOznacenie">{f})</div>'
                f'<div class="text">Zákon č. {rng.randint(1, 500)}/'
                f"{rng.randint(1990, year)} Z. z.</div></div>"
            )
        h.append("</div>")
    h.append(
        '<div class="footer">Ministerstvo spravodlivosti Slovenskej republiky'
        "<br>02 888 91 862<br>helpdesk@slov-lex.sk</div>"
    )
    h.append("</body></html>")

    html = "".join(h)
    spans: List[Span] = [
        {"kind": "html_bytes", "text": html, "media_ref": None, "offset": 0},
        {
            "kind": "media",
            "text": "erb",
            "media_ref": f"img://erb-{law_no}-{year}.png",
            "offset": 1,
        },
    ]
    return spans


# ---------------------------------------------------------------------------
# 2b — PDF-like fragmented annex (table-reconstruction path)
# ---------------------------------------------------------------------------


def synth_pdf_annex(doc_id: str, rng: random.Random) -> List[Span]:
    spans: List[Span] = []
    off = 0

    def cell(text: str, left: float, top: float, page: int = 1, kind: str = "pdf_cell") -> None:
        nonlocal off
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": encode_geometry(page, left, top),
                "offset": off,
            }
        )
        off += 1

    annex_no = rng.randint(1, 3)
    page = 1
    top = 760.0
    cell(
        _encode_win1250(f"Príloha č. {annex_no} k zákonu č. {rng.randint(1,999)}/2003 Z. z.", rng),
        50,
        top,
        page,
    )
    top -= 24

    # preamble (~half the annexes): an innocent sentence that must survive,
    # plus flowed table-row/code fragments that F15 must drop (the text
    # duplicates content the table stage extracts — annex_processor.py:605-684)
    if rng.random() < 0.5:
        cell(
            _encode_win1250("Prehľad odpisových skupín podľa klasifikácie.", rng),
            50, top, page, kind="text",
        )
        top -= 12
        cell(f"1-1 {rng.randint(10, 35)}.{rng.randint(10, 99)} duplikát riadku",
             50, top, page, kind="text")
        top -= 12
        cell(f"{rng.randint(10, 35)}.{rng.randint(10, 99)} {rng.randint(10, 35)}.{rng.randint(10, 99)}",
             50, top, page, kind="text")
        top -= 12

    n_groups = rng.randint(1, 3)
    item_counter = {}
    # emit cells deliberately OUT of reading order within each y-band to force
    # the y-band/x-sort reconstruction (annex_processor.py:1127-1165)
    for g in range(1, n_groups + 1):
        cell(_encode_win1250(f"Odpisová skupina {g}", rng), 50, top, page, kind="section_header")
        top -= 16
        n_items = rng.randint(3, 8)
        for i in range(1, n_items + 1):
            item = f"{g}-{i}"
            kp = f"{rng.randint(10, 35)}.{rng.randint(10, 99)}.{rng.randint(10, 99)}"
            name = _encode_win1250(
                f"{rng.choice(_ITEM_NOUNS)} {rng.choice(['oceľové', 'drevené', 'betónové', 'elektrické'])}",
                rng,
            )
            # shuffled emission order, geometry carries the truth
            cols = [(item, 50.0), (kp, 150.0), (name, 250.0)]
            rng.shuffle(cols)
            for text, left in cols:
                cell(text, left, top, page)
            item_counter[item] = (kp, name)
            top -= 12
            if top < 60:
                top = 760.0
                page += 1

    # a loose-text item for the backfill case (annex_processor.py:897-972)
    g = n_groups
    backfill_item = f"{g}-{len([k for k in item_counter if k.startswith(str(g))]) + 1}"
    cell(
        _encode_win1250(f"{backfill_item} 29.10.13 Motory lodné", rng),
        50,
        top,
        page,
        kind="text",
    )
    top -= 16

    # Poznámky list terminates item collection (annex_processor.py:914-926)
    cell("Poznámky", 50, top, page, kind="section_header")
    top -= 12
    cell(
        _encode_win1250("1. Odpisová skupina sa určí podľa prevažujúceho použitia.", rng),
        50,
        top,
        page,
        kind="list_item",
    )
    spans.append(
        {
            "kind": "media",
            "text": "pečiatka",
            "media_ref": f"img://stamp-{annex_no}.png",
            "offset": off,
        }
    )
    return spans


# ---------------------------------------------------------------------------
# 2c — docling-JSON-shaped pre-parsed stream
# ---------------------------------------------------------------------------


def synth_docling_stream(doc_id: str, rng: random.Random) -> List[Span]:
    spans: List[Span] = []
    off = 0

    def add(kind: str, text: str, media_ref: Optional[str] = None) -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    law_no = rng.randint(1, 999)
    add("text", f"Zákon č. {law_no}/2019 Z. z.", None)
    n_para = rng.randint(1, 4)
    for p in range(1, n_para + 1):
        add("text", f"§ {p}", f"#paragraf-{p}")
        add("section_header", rng.choice(_PARA_TITLES), None)
        for o in range(1, rng.randint(1, 3) + 1):
            add("text", f"({o})", f"#paragraf-{p}.odsek-{o}")
            # fragmented sentence tokens exercising join_tokens (A2)
            sent = _sentence(rng).split()
            cut = rng.randint(1, max(1, len(sent) - 1))
            add("text", " ".join(sent[:cut])[:-0 or None], None)
            add("text", " ".join(sent[cut:]).rstrip("."), None)
            add("text", ".", None)
    # one table as table_cell spans (pointer join J7 shape)
    n_rows, n_cols = rng.randint(2, 4), 3
    headers = ["Položka", "KP", "Názov"]
    for c, htext in enumerate(headers):
        add("table_cell", htext, f"#/tables/0/r0c{c}")
    for r in range(1, n_rows):
        add("table_cell", f"1-{r}", f"#/tables/0/r{r}c0")
        add("table_cell", f"{rng.randint(10, 35)}.{rng.randint(10, 99)}", f"#/tables/0/r{r}c1")
        add("table_cell", rng.choice(_ITEM_NOUNS), f"#/tables/0/r{r}c2")
    add("caption", f"Obrázok 1 – Schéma postupu podľa zákona č. {law_no}/2019 Z. z.", None)
    add("media", "obrázok", f"img://fig-{law_no}.png")
    add("page_footer", "Strana 1", None)
    return spans


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------


def synth_corpus(n_docs: int, seed: int = 42) -> List[Tuple[str, List[Span]]]:
    """Deterministic mixed corpus: ~70% HTML laws / ~20% PDF-like annexes /
    ~10% docling streams, ~1% mega-laws (FIXTURES.md §5 skew)."""
    docs: List[Tuple[str, List[Span]]] = []
    for i in range(n_docs):
        rng = random.Random((seed << 20) ^ i)
        roll = rng.random()
        if roll < 0.70:
            doc_id = f"law-{i:06d}"
            mega = rng.random() < 0.015
            spans = synth_html_law(doc_id, rng, mega=mega)
        elif roll < 0.90:
            doc_id = f"annex-{i:06d}"
            spans = synth_pdf_annex(doc_id, rng)
        else:
            doc_id = f"stream-{i:06d}"
            spans = synth_docling_stream(doc_id, rng)
        docs.append((doc_id, spans))
    return docs


def write_corpus_parquet(path: str, n_docs: int, seed: int = 42) -> None:
    """Write the corpus with pyarrow directly (no Spark needed — usable from
    tests and from bench setup)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = synth_corpus(n_docs, seed)
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.string()),
            "spans": pa.array([d[1] for d in docs], pa.list_(span_type)),
        }
    )
    # small row groups: parquet scans parallelize at row-group granularity,
    # so one giant row group would serialize the whole extraction behind a
    # single task (a 100 TB Iceberg table has many files/row-groups — the
    # sandbox corpus must too, or local parallelism measurements lie)
    pq.write_table(table, path, row_group_size=64)
