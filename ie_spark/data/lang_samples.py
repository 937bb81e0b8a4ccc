"""Planted multilingual sample rows for the language-ID operator.

One deterministic list, consumed by BOTH the Spark query and the DuckDB
oracle (rendered to SQL VALUES from this same list — never hand-copied),
so the driver's value-hash compare exercises every language class with
known-language rows even though the documents corpus itself is English.

``expected`` is the label the marker tables are designed to produce; a
test asserts ``lang_id_multi`` reproduces it exactly.
"""

from __future__ import annotations

# (sample_id, expected, text)
LANG_SAMPLES: list[tuple[str, str, str]] = [
    ("s_de_1", "de", "wir haben ein neues modell und es ist wirklich nicht schlecht"),
    ("s_de_2", "de", "die daten sind auf der platte mit den alten dateien"),
    ("s_de_3", "de", "ich habe eine frage für das nächste treffen"),
    ("s_en_1", "en", "the model is ready and it runs on a single machine"),
    ("s_en_2", "en", "this was a good result for the team in march"),
    ("s_en_3", "en", "an update to the plan that we shipped with confidence"),
    ("s_es_1", "es", "el modelo es bueno y no tiene problemas con los datos"),
    ("s_es_2", "es", "las pruebas que hacemos para el cliente funcionan bien"),
    ("s_es_3", "es", "en una semana se puede ver como funciona todo"),
    ("s_fr_1", "fr", "je suis dans le bureau avec vous pour le projet"),
    ("s_fr_2", "fr", "une bonne idée pour les tests et pas du tout simple"),
    ("s_fr_3", "fr", "qui veut des résultats sur la machine avec nous"),
    ("s_it_1", "it", "questo progetto è per il cliente e non sono sicuro"),
    ("s_it_2", "it", "la prova che facciamo nel sistema anche di notte"),
    ("s_it_3", "it", "si può vedere più risultati della rete con un filtro"),
    ("s_pt_1", "pt", "o modelo é bom em um servidor e não tem problemas"),
    ("s_pt_2", "pt", "os resultados são bons com uma rede mais rápida"),
    ("s_pt_3", "pt", "ele também foi pelo caminho mais longo dos testes"),
    ("s_other_1", "other", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    ("s_other_2", "other", "suomen kieli kuulostaa kauniilta mutta vaikealta oppia"),
    ("s_unk_1", "unk", ""),
    ("s_unk_2", "unk", "   "),
]
