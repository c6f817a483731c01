"""Compact public country gazetteer — from-scratch replacement for the
reference's `country_named_entity_recognition.find_countries` dependency
(TextToCountries.py:6). Canonical names follow ISO 3166 short names;
variants cover common alternate forms. Matching is case-insensitive on
word boundaries, longest-variant-first.
"""

from __future__ import annotations

import re

# canonical name -> variants (canonical itself is always matched)
COUNTRIES: dict[str, list[str]] = {
    "Afghanistan": [], "Albania": [], "Algeria": [], "Andorra": [], "Angola": [],
    "Argentina": [], "Armenia": [], "Australia": [], "Austria": [],
    "Azerbaijan": [], "Bahamas": [], "Bahrain": [], "Bangladesh": [],
    "Barbados": [], "Belarus": [], "Belgium": [], "Belize": [], "Benin": [],
    "Bhutan": [], "Bolivia": ["Plurinational State of Bolivia"],
    "Bosnia and Herzegovina": ["Bosnia"], "Botswana": [],
    "Brazil": ["Brasil"], "Brunei": ["Brunei Darussalam"], "Bulgaria": [],
    "Burkina Faso": [], "Burundi": [], "Cambodia": [], "Cameroon": [],
    "Canada": [], "Chad": [], "Chile": [],
    "China": ["People's Republic of China", "PRC"],
    "Colombia": [], "Comoros": [], "Costa Rica": [], "Croatia": [],
    "Cuba": [], "Cyprus": [], "Czechia": ["Czech Republic"],
    "Democratic Republic of the Congo": ["DR Congo", "DRC", "Congo-Kinshasa"],
    "Denmark": [], "Djibouti": [], "Dominica": [], "Dominican Republic": [],
    "Ecuador": [], "Egypt": [], "El Salvador": [], "Eritrea": [],
    "Estonia": [], "Eswatini": ["Swaziland"], "Ethiopia": [], "Fiji": [],
    "Finland": [], "France": [], "Gabon": [], "Gambia": [], "Georgia": [],
    "Germany": [], "Ghana": [], "Greece": [], "Guatemala": [], "Guinea": [],
    "Guyana": [], "Haiti": [], "Honduras": [], "Hungary": [], "Iceland": [],
    "India": [], "Indonesia": [],
    "Iran": ["Islamic Republic of Iran"], "Iraq": [],
    "Ireland": [], "Israel": [], "Italy": [], "Jamaica": [], "Japan": [],
    "Jordan": [], "Kazakhstan": [], "Kenya": [], "Kiribati": [],
    "Kuwait": [], "Kyrgyzstan": [],
    "Laos": ["Lao People's Democratic Republic"],
    "Latvia": [], "Lebanon": [], "Lesotho": [], "Liberia": [], "Libya": [],
    "Liechtenstein": [], "Lithuania": [], "Luxembourg": [], "Madagascar": [],
    "Malawi": [], "Malaysia": [], "Maldives": [], "Mali": [], "Malta": [],
    "Mauritania": [], "Mauritius": [], "Mexico": [], "Moldova": ["Republic of Moldova"],
    "Monaco": [], "Mongolia": [], "Montenegro": [], "Morocco": [],
    "Mozambique": [], "Myanmar": ["Burma"], "Namibia": [], "Nepal": [],
    "Netherlands": ["The Netherlands", "Holland"], "New Zealand": [],
    "Nicaragua": [], "Niger": [], "Nigeria": [],
    "North Korea": ["Democratic People's Republic of Korea", "DPRK"],
    "North Macedonia": ["Macedonia"], "Norway": [], "Oman": [],
    "Pakistan": [], "Panama": [], "Papua New Guinea": [], "Paraguay": [],
    "Peru": [], "Philippines": [], "Poland": [], "Portugal": [],
    "Qatar": [], "Romania": [],
    "Russia": ["Russian Federation"], "Rwanda": [], "Samoa": [],
    "San Marino": [], "Saudi Arabia": [], "Senegal": [], "Serbia": [],
    "Seychelles": [], "Sierra Leone": [], "Singapore": [], "Slovakia": [],
    "Slovenia": [], "Solomon Islands": [], "Somalia": [],
    "South Africa": [], "South Korea": ["Republic of Korea", "Korea"],
    "South Sudan": [], "Spain": [], "Sri Lanka": [], "Sudan": [],
    "Suriname": [], "Sweden": [], "Switzerland": [],
    "Syria": ["Syrian Arab Republic"], "Tajikistan": [],
    "Tanzania": ["United Republic of Tanzania"], "Thailand": [],
    "Timor-Leste": ["East Timor"], "Togo": [], "Tonga": [],
    "Trinidad and Tobago": [], "Tunisia": [],
    "Turkey": ["Türkiye", "Turkiye"], "Turkmenistan": [], "Tuvalu": [],
    "Uganda": [], "Ukraine": [], "United Arab Emirates": ["UAE"],
    "United Kingdom": ["Great Britain", "UK", "Britain"],
    "United States": ["United States of America", "USA", "US"],
    "Uruguay": [], "Uzbekistan": [], "Vanuatu": [],
    "Venezuela": ["Bolivarian Republic of Venezuela"],
    "Vietnam": ["Viet Nam"], "Yemen": [], "Zambia": [], "Zimbabwe": [],
}

_VARIANT_TO_CANONICAL: dict[str, str] = {}
for _canon, _variants in COUNTRIES.items():
    _VARIANT_TO_CANONICAL[_canon.lower()] = _canon
    for _v in _variants:
        _VARIANT_TO_CANONICAL[_v.lower()] = _canon

_PATTERN = re.compile(
    r"\b("
    + "|".join(
        re.escape(v) for v in sorted(_VARIANT_TO_CANONICAL, key=len, reverse=True)
    )
    + r")\b",
    re.IGNORECASE,
)


def find_countries(text: str) -> list[str]:
    """Canonical country names found in text, in order of first appearance,
    deduplicated. Case-insensitive, word-boundary, longest-variant-first."""
    if not text:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for m in _PATTERN.finditer(text):
        canon = _VARIANT_TO_CANONICAL[m.group(0).lower()]
        if canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out
