"""Deterministic reference-shaped nested-JSON fixtures (FIXTURES.md §2).

Generates `coursera_response_<ts>.json` documents matching the source
schema derived from the GraphQL query (extract-service/main.py:46-145)
— used by the pipeline-parity tests and the rows-only harness entry.
No randomness: content is a pure function of the index arguments.
"""

from __future__ import annotations

import json
import os

TYPENAMES = ("DiscoveryCollectionsSpecialization",
             "DiscoveryCollectionsCourse",
             "DiscoveryCollectionsProfessionalCertificate")


def make_entity(i: int, *, drop_optionals: bool = False) -> dict:
    variant = TYPENAMES[i % 3]
    ent: dict = {
        "__typename": variant,
        "id": f"ent-{i}",
        "slug": f"slug-{i}",
        "name": f"Course {i}",
        "url": f"/learn/slug-{i}",
        "partnerIds": [f"p{i}", f"p{i + 1}"],
        "imageUrl": f"https://img.example/{i}.png",
        "partners": [{"id": f"p{i}", "name": f"Partner {i}", "logo": f"l{i}"},
                     {"id": f"p{i + 1}", "name": f"Partner {i + 1}", "logo": f"l{i + 1}"}],
        "productCard": {
            "id": f"card-{i}",
            "marketingProductType": variant.removeprefix("DiscoveryCollections").upper(),
            "productTypeAttributes": {"isPathwayContent": i % 2 == 0},
        },
    }
    if not drop_optionals:
        ent["difficultyLevel"] = ("Beginner", "Intermediate", "Advanced")[i % 3]
        ent["isPartOfCourseraPlus"] = i % 2 == 1
        if variant.endswith("Specialization"):
            ent["courseCount"] = 3 + i % 5
        if variant.endswith("Course"):
            ent["isCostFree"] = i % 4 == 0
    return ent


def make_response(n_collections: int = 2, entities_per: int = 3,
                  *, drop_optionals: bool = False) -> list[dict]:
    collections = []
    for ci in range(n_collections):
        collections.append({
            "__typename": "DiscoveryCollection",
            "id": f"coll-{ci}",
            "label": f"Collection {ci}",
            "linkedCollectionPageMetadata": {"url": f"/collections/coll-{ci}"},
            "entities": [make_entity(ci * entities_per + ei,
                                     drop_optionals=drop_optionals)
                         for ei in range(entities_per)],
        })
    return [{"data": {"DiscoveryCollections": {"queryCollections": collections}}}]


ERROR_RESPONSE = [{"error": "RATE_LIMITED", "message": "try again later"}]
EMPTY_RESPONSE = [{"data": {"DiscoveryCollections": {"queryCollections": []}}}]


def write_response_file(payload: list[dict], out_dir: str, ts: str) -> str:
    """Timestamped immutable partition naming (O7,
    extract-service/main.py:217-219), pretty-printed like the
    reference (:201-203)."""
    path = os.path.join(out_dir, f"coursera_response_{ts}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    return path
