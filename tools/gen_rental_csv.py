#!/usr/bin/env python3
"""Deterministic rental-raw CSV fixture generator (FIXTURES.md §2).

Writes data/rental_raw.csv: 64 rows, the 29-column stringly raw schema of
the reference's scraper output (main_otodom.py:254-284), missing values as
the literal "brak informacji" (main_otodom.py:244-246). Covers: money-string
variants, comma decimals, zero area (ratio → Inf), 0/0 (→ NaN), malformed
timestamp, location-split variants, multi-valued ", "-joined and
bullet-separated fields, duplicate listing rows, cities with ≥2 districts.
Dev tool — run once, output is committed.
"""
import csv, copy, os

COLS = ["tytuł", "miesięcznie", "czynsz", "kaucja", "powierzchnia",
        "województwo", "powiat", "miasto", "dzielnica", "ulica", "lokalizacja",
        "liczba pokoi", "typ ogłoszeniodawcy", "ogrzewanie", "piętro",
        "stan wykończenia", "dostępne od", "informacje dodatkowe",
        "rok budowy", "winda", "rodzaj zabudowy", "materiał budynku",
        "okna", "bezpieczeństwo", "wyposażenie", "zabezpieczenia", "media",
        "url", "data_pobrania"]

BRAK = "brak informacji"
PRICES = ["3 200 zł", "1 500,50 zł", BRAK, "2,5", "750 zł", "-42 zł",
          "4 000 zł", "2 800 zł"]
AREAS = ["27.4", "45.0", "0", BRAK, "62.5", "38.2"]
VOIV = ["mazowieckie", "małopolskie", "pomorskie", "śląskie", "dolnośląskie",
        BRAK, "wielkopolskie", "łódzkie"]
CITY = ["Warszawa", "Kraków", "Gdańsk", "Katowice", "Wrocław", "Poznań",
        "Łódź", BRAK]
DIST = ["Wola", "Stare Miasto", BRAK]
ROOMS = ["3", "2 pokoje", "Kawalerka", "4", "1"]
ADVERT = ["prywatny", "biuro nieruchomości", "Prywatny"]
ADDIT = ["winda; balkon • piwnica", "oddzielna kuchnia, pom. użytkowe", BRAK]
EQUIP = ["pralka, lodówka, zmywarka", "meble, piekarnik", BRAK]

def row(i: int) -> dict:
    woj, city, dist = VOIV[i % 8], CITY[i % 8], DIST[i % 3]
    if i % 7 == 0:
        lok = BRAK
    elif i % 5 == 0:
        lok = f"ul. Przykładowa {i}, {dist}, {city}, {woj}"
    else:
        lok = f"{dist}, {city}, {woj}"
    return {
        "tytuł": f"Kawalerka {i}" if i % 13 == 0 else f"Mieszkanie {i} do wynajęcia",
        "miesięcznie": PRICES[i % 8],
        "czynsz": ["500", BRAK, "350", "0"][i % 4],
        "kaucja": ["3 000 zł", BRAK][i % 2],
        "powierzchnia": AREAS[i % 6],
        "województwo": woj, "powiat": ["warszawski", BRAK, BRAK][i % 3],
        "miasto": city, "dzielnica": dist,
        "ulica": [f"ul. Przykładowa {i}", BRAK][i % 2], "lokalizacja": lok,
        "liczba pokoi": ROOMS[i % 5],
        "typ ogłoszeniodawcy": ADVERT[i % 3],
        "ogrzewanie": ["miejskie", "gazowe", BRAK][i % 3],
        "piętro": ["2", "parter", "10", BRAK][i % 4],
        "stan wykończenia": ["do zamieszkania", "do wykończenia"][i % 2],
        "dostępne od": ["2025-07-01", "od zaraz"][i % 2],
        "informacje dodatkowe": ADDIT[i % 3],
        "rok budowy": ["2010", "1985", BRAK][i % 3],
        "winda": ["tak", "nie"][i % 2],
        "rodzaj zabudowy": ["blok", "kamienica", "apartamentowiec"][i % 3],
        "materiał budynku": ["cegła", "wielka płyta", BRAK][i % 3],
        "okna": ["plastikowe", "drewniane"][i % 2],
        "bezpieczeństwo": ["drzwi / okna antywłamaniowe", BRAK][i % 2],
        "wyposażenie": EQUIP[i % 3],
        "zabezpieczenia": ["domofon / wideofon", "monitoring / ochrona", BRAK][i % 3],
        "media": ["internet, telewizja kablowa", BRAK][i % 2],
        "url": f"https://www.otodom.pl/pl/oferta/mieszkanie-{i}",
        "data_pobrania": "2025-06-14 12:00:00",
    }

rows = [row(i) for i in range(64)]
rows[50]["miesięcznie"] = "0 zł"       # with area "0" (50%6==2) → 0/0 → NaN
rows[55]["data_pobrania"] = "junk-date"  # timestamp coerce → null
rows[61] = copy.deepcopy(rows[60])       # byte-identical duplicate listing
rows[62]["url"] = "https://example.com/not-an-offer"

os.makedirs("data", exist_ok=True)
with open("data/rental_raw.csv", "w", newline="", encoding="utf-8") as f:
    w = csv.DictWriter(f, fieldnames=COLS)
    w.writeheader()
    w.writerows(rows)
print(f"wrote data/rental_raw.csv ({len(rows)} rows)")
