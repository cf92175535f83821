"""Hand-written IMDb-shaped fixture TSVs covering every edge case in
FIXTURES.md: duplicate key rows, \\N in non-nullable columns, nullable
strict bools, dangling knownForTitles references, unknown episode parents,
unrated titles, multi-token alias types (+ unknown leftover), repeated and
multi-element characters JSON, multi-genre ordering, stray '"' characters.
"""

from __future__ import annotations

import gzip
import os

FIXTURE_TSVS: dict[str, str] = {
    "name.basics": """nconst	primaryName	birthYear	deathYear	primaryProfession	knownForTitles
nm0000001	Alice Actor	1970	\\N	actress,producer	tt0000001,tt9999999,tt0000002
nm0000002	Bob Builder	1960	2020	director	tt0000002
nm0000003	Carol "Quotes" Char	\\N	\\N	\\N	\\N
nm0000001	Alice DUPLICATE	1971	\\N	actress	tt0000001
""",
    "title.basics": """tconst	titleType	primaryTitle	originalTitle	isAdult	startYear	endYear	runtimeMinutes	genres
tt0000001	movie	First Movie	Erste Film	0	1999	\\N	100	Action,Comedy
tt0000002	tvSeries	The Series	The Series	0	2005	2010	45	Drama
tt0000003	tvEpisode	Ep One	Ep One	\\N	2005	\\N	45	Drama,Comedy
tt0000004	movie	No "Rating"	No Rating	1	2010	\\N	\\N	\\N
""",
    "title.akas": """titleId	ordering	title	region	language	types	attributes	isOriginalTitle
tt0000001	1	First Movie	US	en	imdbDisplay	\\N	0
tt0000001	2	Erste Film	DE	de	festivalworking	\\N	\\N
tt0000002	1	The Series	\\N	\\N	originalalternative	\\N	1
tt0000002	2	La Serie	FR	fr	bogustype	\\N	0
tt0000001	1	DUP ROW	US	en	dvd	\\N	0
""",
    "title.crew": """tconst	directors	writers
tt0000001	nm0000002	\\N
tt0000002	nm0000002	nm0000001,nm0000002
""",
    "title.episode": """tconst	parentTconst	seasonNumber	episodeNumber
tt0000003	tt0000002	1	1
tt0000004	tt7777777	2	3
""",
    "title.principals": """tconst	ordering	nconst	category	job	characters
tt0000001	1	nm0000001	actress	\\N	["Jane", "Queen"]
tt0000001	2	nm0000002	director	\\N	\\N
tt0000002	1	nm0000001	actress	\\N	["Jane", "Queen"]
tt0000002	2	nm0000003	self	host	["Self"]
tt0000003	1	nm0000003	self	\\N	["Self"]
tt0000001	1	nm0000009	actor	\\N	DUP-ROW-NEVER-PARSED
""",
    "title.ratings": """tconst	averageRating	numVotes
tt0000001	7.5	1000
tt0000002	8.2	500
""",
}


def write_fixtures(target_dir: str, gzipped: bool = True) -> str:
    os.makedirs(target_dir, exist_ok=True)
    for dataset, content in FIXTURE_TSVS.items():
        if gzipped:
            with gzip.open(os.path.join(target_dir, f"{dataset}.tsv.gz"), "wt") as f:
                f.write(content)
        else:
            with open(os.path.join(target_dir, f"{dataset}.tsv"), "w") as f:
                f.write(content)
    return target_dir
