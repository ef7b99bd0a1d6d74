"""Format-tag vocabulary for gendata templates (SURVEY.md §2.C C4).

The reference registers every zero-arg gofakeit faker as a ``{{tag}}``
(``src/generator/format_tags.go:38-86``; tag table
``src/generator/README.md``). gofakeit draws from embedded word lists with
a process-local RNG; the Spark engine re-expresses each tag as a
DETERMINISTIC column expression — a seedless-hash pick from a fixed
vocabulary, or a hash-derived number/format — so generation is reproducible
under retries and across sessions (same rule as every other generator:
``xxhash64(row_id, seed)``, never ``rand()``).

Vocabularies are small curated stand-ins (5-10 entries each), NOT the
gofakeit corpora: the contract is the TAG SURFACE (a genconf written for
the reference renders without error, types line up), not lexical parity.
Unknown tags still raise — failing loudly beats generating garbage.

Three tag classes:
- ``VOCABS``: pick one of N fixed strings
- ``INT_RANGES``: uniform integer in [lo, hi]
- composite builders in ``_COMPOSITES``: emails, urls, uuids, phone
  numbers, sentences ... assembled from the primitives
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["supported_tags", "tag_column"]

# rand_long(seed, lo, hi) -> Column[bigint]; injected by generators.py so
# the whole module stays free of the spine/seed plumbing
RandLong = Callable[[str, int, int], Column]
Md5 = Callable[[str], Column]  # md5(seed) -> Column[hex string] per row

VOCABS: dict[str, tuple[str, ...]] = {
    # words / parts of speech
    "word": ("alpha", "bravo", "carol", "delta", "echo", "foxtrot", "golf", "hotel"),
    "noun": ("river", "engine", "forest", "signal", "harbor", "ledger", "beacon"),
    "noun_common": ("time", "year", "way", "day", "thing", "world", "life"),
    "noun_concrete": ("hammer", "bottle", "bridge", "garden", "mirror", "candle"),
    "noun_abstract": ("freedom", "wisdom", "courage", "sorrow", "progress", "truth"),
    "noun_proper": ("Aldebaran", "Brindle", "Corinth", "Darrow", "Ellison"),
    "noun_countable": ("book", "chair", "apple", "ticket", "island", "engine"),
    "noun_uncountable": ("water", "sand", "music", "advice", "luggage", "weather"),
    "noun_determiner": ("this", "that", "these", "those", "each", "every"),
    "noun_collective_people": ("team", "crew", "jury", "choir", "committee"),
    "noun_collective_animal": ("herd", "flock", "pack", "swarm", "pride"),
    "noun_collective_thing": ("bundle", "fleet", "stack", "cluster", "set"),
    "verb": ("run", "build", "carry", "measure", "explore", "signal", "gather"),
    "verb_action": ("jump", "throw", "catch", "push", "lift", "sprint"),
    "verb_linking": ("is", "are", "was", "were", "seems", "becomes"),
    "verb_helping": ("can", "could", "will", "would", "should", "must"),
    "verb_transitive": ("carry", "send", "paint", "read", "open", "close"),
    "verb_intransitive": ("sleep", "arrive", "laugh", "vanish", "wander"),
    "adjective": ("quiet", "bright", "sturdy", "narrow", "gentle", "rapid"),
    "adjective_descriptive": ("crimson", "hollow", "gleaming", "rugged", "mellow"),
    "adjective_quantitative": ("few", "many", "several", "all", "some", "most"),
    "adjective_demonstrative": ("this", "that", "these", "those"),
    "adjective_possessive": ("my", "your", "his", "her", "its", "our", "their"),
    "adjective_interrogative": ("which", "what", "whose"),
    "adjective_indefinite": ("any", "each", "either", "neither", "both"),
    "adjective_proper": ("Nordic", "Roman", "Alpine", "Baltic", "Saxon"),
    "adverb": ("quickly", "gently", "boldly", "rarely", "openly", "evenly"),
    "adverb_manner": ("carefully", "loudly", "neatly", "softly", "bravely"),
    "adverb_degree": ("almost", "fully", "hardly", "nearly", "quite", "too"),
    "adverb_place": ("here", "there", "nearby", "upstairs", "outside"),
    "adverb_time_definite": ("today", "yesterday", "tomorrow", "tonight"),
    "adverb_time_indefinite": ("soon", "later", "recently", "eventually"),
    "adverb_frequency_definite": ("daily", "weekly", "monthly", "yearly", "hourly"),
    "adverb_frequency_indefinite": ("often", "rarely", "sometimes", "usually", "never"),
    "preposition": ("over", "under", "beside", "within", "against", "beyond"),
    "preposition_simple": ("at", "by", "in", "of", "on", "to", "up"),
    "preposition_double": ("into", "onto", "upon", "within", "without"),
    "preposition_compound": ("according to", "ahead of", "because of", "close to"),
    "pronoun": ("I", "you", "he", "she", "it", "we", "they"),
    "pronoun_personal": ("I", "you", "he", "she", "it", "we", "they"),
    "pronoun_object": ("me", "you", "him", "her", "it", "us", "them"),
    "pronoun_possessive": ("mine", "yours", "his", "hers", "ours", "theirs"),
    "pronoun_reflective": ("myself", "yourself", "himself", "herself", "itself"),
    "pronoun_demonstrative": ("this", "that", "these", "those"),
    "pronoun_interrogative": ("who", "whom", "whose", "which", "what"),
    "pronoun_relative": ("who", "whom", "whose", "which", "that"),
    "pronoun_indefinite": ("anyone", "everyone", "someone", "nobody", "each"),
    "interjection": ("wow", "ouch", "hooray", "alas", "aha", "oops"),
    "connective": ("and", "but", "or", "so", "yet", "for"),
    "connective_time": ("first", "then", "next", "finally", "meanwhile"),
    "connective_comparative": ("likewise", "similarly", "in contrast", "however"),
    "connective_complaint": ("besides", "furthermore", "moreover", "in fact"),
    "connective_listing": ("firstly", "secondly", "lastly", "to begin with"),
    "connective_casual": ("because", "since", "therefore", "thus", "hence"),
    "connective_examplify": ("for example", "for instance", "namely", "such as"),
    "vowel": ("a", "e", "i", "o", "u"),
    "hipster_word": ("artisan", "kombucha", "vinyl", "mustache", "organic", "retro"),
    "lorem_ipsum_word": ("lorem", "ipsum", "dolor", "sit", "amet", "consectetur"),
    "buzz_word": ("synergy", "pivot", "leverage", "holistic", "scalable", "agile"),
    "bs": ("empower", "streamline", "monetize", "disintermediate", "incentivize"),
    # people
    "first_name": ("Ada", "Brian", "Carmen", "Dmitri", "Elena", "Farid", "Grace", "Hugo"),
    "middle_name": ("Lee", "Rae", "Jay", "Quinn", "Blake", "Sage"),
    "last_name": ("Adason", "Briansen", "Carmenson", "Dmitrov", "Elenova", "Faridi"),
    "name_prefix": ("Mr.", "Ms.", "Mrs.", "Dr.", "Prof."),
    "name_suffix": ("Jr.", "Sr.", "II", "III", "PhD", "MD"),
    "gender": ("male", "female"),
    "pet_name": ("Biscuit", "Mochi", "Pepper", "Waffles", "Ziggy", "Noodle"),
    "hobby": ("archery", "birding", "chess", "pottery", "sailing", "origami"),
    "job_title": ("Engineer", "Analyst", "Director", "Designer", "Technician"),
    "job_descriptor": ("Lead", "Senior", "Principal", "Global", "Dynamic"),
    "job_level": ("Solutions", "Programs", "Operations", "Research", "Markets"),
    "celebrity_actor": ("Avery Stone", "Blair Hale", "Casey Monroe", "Drew Lane"),
    "celebrity_business": ("Jordan Vale", "Morgan Pike", "Riley Frost"),
    "celebrity_sport": ("Sky Harper", "Reese Bolt", "Quinn Rivers"),
    # places
    "city": ("Aalborg", "Bogota", "Cusco", "Dakar", "Espoo", "Fukuoka", "Gdansk"),
    "state": ("Alabama", "Colorado", "Georgia", "Kansas", "Montana", "Oregon", "Vermont"),
    "state_abr": ("AL", "CO", "GA", "KS", "MT", "OR", "VT"),
    "country": ("Argentina", "Belgium", "Canada", "Denmark", "Estonia", "Finland", "Ghana"),
    "country_abr": ("AR", "BE", "CA", "DK", "EE", "FI", "GH"),
    "street_prefix": ("North", "South", "East", "West", "Lake", "Port"),
    "street_name": ("Maple", "Cedar", "Willow", "Juniper", "Alder", "Rowan"),
    "street_suffix": ("Street", "Avenue", "Road", "Lane", "Drive", "Court"),
    "time_zone": ("Pacific Standard Time", "Central European Time", "Japan Standard Time"),
    "time_zone_abv": ("PST", "CET", "JST", "UTC", "EST", "IST"),
    "time_zone_full": ("(UTC-08:00) Pacific Time", "(UTC+01:00) Amsterdam", "(UTC+09:00) Tokyo"),
    "time_zone_region": ("America/Los_Angeles", "Europe/Amsterdam", "Asia/Tokyo"),
    "language": ("Danish", "Estonian", "Finnish", "Georgian", "Hindi", "Icelandic"),
    "language_abbreviation": ("da", "et", "fi", "ka", "hi", "is"),
    "language_bcp": ("da-DK", "et-EE", "fi-FI", "ka-GE", "hi-IN", "is-IS"),
    "school": ("Northlake University", "Harbor View College", "Summit Institute"),
    # things
    "animal": ("otter", "badger", "lynx", "heron", "ibex", "marmot"),
    "animal_type": ("mammal", "bird", "reptile", "amphibian", "fish", "insect"),
    "farm_animal": ("cow", "sheep", "goat", "hen", "pig", "horse"),
    "cat": ("Siamese", "Bengal", "Manx", "Sphynx", "Birman", "Ragdoll"),
    "dog": ("Beagle", "Collie", "Samoyed", "Vizsla", "Whippet", "Akita"),
    "bird": ("sparrow", "kestrel", "plover", "siskin", "wren", "tern"),
    "fruit": ("apple", "plum", "quince", "fig", "pear", "cherry"),
    "vegetable": ("carrot", "kale", "leek", "turnip", "fennel", "beet"),
    "breakfast": ("oat porridge", "rye toast", "berry yogurt", "egg scramble"),
    "lunch": ("lentil soup", "grain bowl", "club sandwich", "garden salad"),
    "dinner": ("baked trout", "mushroom risotto", "pepper stew", "roast chicken"),
    "snack": ("trail mix", "rice cracker", "apple chips", "granola bar"),
    "dessert": ("almond tart", "pear sorbet", "honey cake", "plum crumble"),
    "drink": ("water", "coffee", "tea", "cider", "lemonade", "cocoa"),
    "beer_name": ("Harbor Lights", "Iron Bell", "Cloudline", "Old Quarry"),
    "beer_style": ("Pale Ale", "Stout", "Pilsner", "Saison", "Porter", "Lager"),
    "beer_hop": ("Cascade", "Citra", "Saaz", "Fuggle", "Galaxy", "Mosaic"),
    "beer_yeast": ("1056 American Ale", "3068 Weihenstephan", "2007 Pilsen Lager"),
    "beer_malt": ("Pale", "Munich", "Vienna", "Caramel", "Chocolate", "Rye"),
    "color": ("red", "orange", "yellow", "green", "blue", "indigo", "violet", "gray"),
    "safe_color": ("black", "white", "gray", "silver", "maroon", "olive", "navy"),
    "company_suffix": ("Inc", "LLC", "Group", "Labs", "Holdings", "Partners"),
    "product_name": ("Stream Lamp", "Bolt Kettle", "Drift Chair", "Pulse Fan"),
    "product_category": ("electronics", "furniture", "outdoor", "kitchenware"),
    "product_feature": ("wireless", "waterproof", "foldable", "ultra-light"),
    "product_material": ("oak", "steel", "ceramic", "linen", "bamboo"),
    "product_benefit": ("saves time", "cuts cost", "boosts focus", "adds comfort"),
    "product_suffix": ("Pro", "Mini", "Max", "Lite", "Plus"),
    "product_use_case": ("home office", "travel", "outdoor cooking", "daily commute"),
    "product_dimension": ("10x4x3 cm", "25x20x5 cm", "60x40x30 cm"),
    "movie_genre": ("Action", "Comedy", "Drama", "Mystery", "Western", "Sci-Fi"),
    "movie_name": ("Silent Harbor", "Iron Meadow", "The Last Ledger", "North of Nowhere"),
    "book_title": ("The Glass Orchard", "A Winter Ledger", "Maps of Nowhere"),
    "book_author": ("I. Marlowe", "R. Castellan", "T. Okafor", "S. Lindqvist"),
    "book_genre": ("Fantasy", "Biography", "Thriller", "History", "Poetry"),
    "song_name": ("Paper Rivers", "Glasslight", "Northern Line", "Ember Days"),
    "song_artist": ("The Larks", "Mira Vale", "Stone Circus", "Delta Nine"),
    "song_genre": ("Folk", "Jazz", "Electronic", "Rock", "Classical"),
    "emoji": ("😀", "🎉", "🌲", "🚀", "🐙", "📦"),
    "emoji_description": ("grinning face", "party popper", "evergreen tree", "rocket"),
    "emoji_category": ("Smileys & Emotion", "Animals & Nature", "Objects", "Travel & Places"),
    "emoji_alias": ("smile", "tada", "evergreen_tree", "rocket", "octopus", "package"),
    "emoji_tag": ("happy", "celebration", "nature", "space", "sea", "shipping"),
    "flip_a_coin": ("Heads", "Tails"),
    # hacker / minecraft flavor sets
    "hacker_abbreviation": ("TCP", "HTTP", "SQL", "RAM", "GPU", "API"),
    "hacker_adjective": ("neural", "optical", "solid state", "open-source", "virtual"),
    "hacker_noun": ("firewall", "protocol", "interface", "pixel", "matrix", "bus"),
    "hacker_verb": ("parse", "compress", "encrypt", "override", "index", "reboot"),
    "hackering_verb": ("parsing", "compressing", "encrypting", "overriding", "indexing"),
    "hacker_phrase": (
        "overriding the neural firewall",
        "compressing the optical matrix",
        "indexing the virtual interface",
    ),
    "minecraft_ore": ("coal", "iron", "gold", "diamond", "emerald", "redstone"),
    "minecraft_wood": ("oak", "spruce", "birch", "jungle", "acacia", "dark oak"),
    "minecraft_armor_tier": ("leather", "chainmail", "iron", "gold", "diamond", "netherite"),
    "minecraft_armor_part": ("helmet", "chestplate", "leggings", "boots"),
    "minecraft_weapon": ("sword", "bow", "crossbow", "trident", "axe"),
    "minecraft_tool": ("pickaxe", "shovel", "hoe", "fishing rod", "shears"),
    "minecraft_dye": ("white", "orange", "magenta", "light blue", "lime"),
    "minecraft_food": ("bread", "carrot", "cooked beef", "golden apple", "melon"),
    "minecraft_animal": ("chicken", "cow", "pig", "sheep", "rabbit", "wolf"),
    "minecraft_villager_job": ("armorer", "butcher", "cartographer", "farmer", "librarian"),
    "minecraft_villager_station": ("blast furnace", "smoker", "cartography table", "composter"),
    "minecraft_villager_level": ("novice", "apprentice", "journeyman", "expert", "master"),
    "minecraft_mob_passive": ("bat", "cat", "chicken", "cod", "cow", "ocelot"),
    "minecraft_mob_neutral": ("bee", "dolphin", "goat", "llama", "panda", "wolf"),
    "minecraft_mob_hostile": ("blaze", "creeper", "drowned", "ghast", "skeleton"),
    "minecraft_mob_boss": ("ender dragon", "wither"),
    "minecraft_weather": ("clear", "rain", "thunder"),
    "minecraft_biome": ("plains", "desert", "taiga", "swamp", "savanna", "badlands"),
    # tech / formats
    "programming_language": ("Python", "Go", "Rust", "Scala", "SQL", "TypeScript"),
    "http_method": ("GET", "POST", "PUT", "PATCH", "DELETE", "HEAD", "OPTIONS"),
    "http_version": ("HTTP/1.0", "HTTP/1.1", "HTTP/2.0"),
    "file_extension": ("csv", "json", "parquet", "txt", "yaml", "avro"),
    "file_mime_type": (
        "text/csv",
        "application/json",
        "application/octet-stream",
        "text/plain",
        "application/x-parquet",
    ),
    "domain_suffix": ("com", "org", "net", "io", "dev", "info"),
    "credit_card_type": ("Visa", "Mastercard", "American Express", "Discover", "JCB"),
    "currency_short": ("USD", "EUR", "JPY", "GBP", "CHF", "SEK"),
    "currency_long": ("United States Dollar", "Euro", "Japanese Yen", "Pound Sterling"),
    "car_maker": ("Toyonda", "Fordson", "Volvette", "Nissota", "Subachi"),
    "car_model": ("Vista", "Ridge", "Compass", "Meridian", "Atlas"),
    "car_type": ("Passenger car mini", "Sport utility vehicle", "Pickup truck", "Van"),
    "car_fuel_type": ("Gasoline", "Diesel", "Electric", "Hybrid", "LPG", "CNG"),
    "car_transmission_type": ("Manual", "Automatic", "CVT"),
    "month_string": (
        "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November", "December",
    ),
    "week_day": ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"),
    # errors (gofakeit returns error values; the template renders the message)
    "error": ("failed to process request", "invalid state", "operation timed out"),
    "error_database": ("connection refused", "deadlock detected", "duplicate key"),
    "error_grpc": ("code = Unavailable", "code = DeadlineExceeded", "code = NotFound"),
    "error_http": ("400 Bad Request", "404 Not Found", "500 Internal Server Error"),
    "error_http_client": ("400 Bad Request", "401 Unauthorized", "429 Too Many Requests"),
    "error_http_server": ("500 Internal Server Error", "502 Bad Gateway", "503 Service Unavailable"),
    "error_runtime": ("nil pointer dereference", "index out of range", "stack overflow"),
    "error_validation": ("field is required", "value out of range", "malformed input"),
    "error_object": ("object not found", "object locked", "object expired"),
    "input_name": ("first_name", "last_name", "email", "address", "phone", "message"),
}

INT_RANGES: dict[str, tuple[int, int]] = {
    "year": (1970, 2025),
    "month": (1, 12),
    "day": (1, 28),
    "hour": (0, 23),
    "minute": (0, 59),
    "second": (0, 59),
    "nano_second": (0, 999_999_999),
    "number": (0, 999_999),
    "int": (-(2**31), 2**31 - 1),
    "uint": (0, 2**32 - 1),
    "int_8": (-128, 127),
    "uint_8": (0, 255),
    "int_16": (-32768, 32767),
    "uint_16": (0, 65535),
    "int_32": (-(2**31), 2**31 - 1),
    "uint_32": (0, 2**32 - 1),
    # 64-bit bounds clipped so the range SPAN stays a valid BIGINT
    "int_64": (-(2**61), 2**61 - 1),
    "uint_64": (0, 2**62 - 1),
    "street_number": (1, 9999),
    "beer_ibu": (10, 100),
    "beer_alcohol": (2, 12),
    "beer_blg": (5, 20),
    "ach_account": (100_000_000_000, 999_999_999_999),
    "ach_routing": (100_000_000, 999_999_999),
}

_STATUS_CODES = (200, 201, 204, 301, 302, 400, 401, 403, 404, 409, 429, 500, 502, 503)
_STATUS_SIMPLE = (200, 301, 404, 500)


def supported_tags() -> frozenset[str]:
    return frozenset(VOCABS) | frozenset(INT_RANGES) | frozenset(_COMPOSITES)


def tag_column(tag: str, seed: str, rand_long: RandLong, md5: Md5) -> Column | None:
    """Column for one ``{{tag}}``; None when the tag is unknown (the caller
    raises with context). ``rand_long(seed, lo, hi)`` and ``md5(seed)`` are
    the deterministic primitives injected by generators.py."""
    if tag in VOCABS:
        return _pick(VOCABS[tag], seed + "#tag:" + tag, rand_long)
    if tag in INT_RANGES:
        lo, hi = INT_RANGES[tag]
        return rand_long(seed + "#tag:" + tag, lo, hi).cast("string")
    builder = _COMPOSITES.get(tag)
    if builder is not None:
        return builder(seed + "#tag:" + tag, rand_long, md5)
    return None


def _pick(vocab: tuple[str, ...], seed: str, rand_long: RandLong) -> Column:
    idx = rand_long(seed, 1, len(vocab))
    return F.element_at(F.array(*[F.lit(w) for w in vocab]), idx.cast("int"))


# --------------------------------------------------------------------------
# composite builders
# --------------------------------------------------------------------------
def _digits(seed: str, n: int, rand_long: RandLong) -> Column:
    return F.format_string(f"%0{n}d", rand_long(seed, 0, 10**n - 1))


def _hex_chars(seed: str, n: int, md5: Md5, offset: int = 1) -> Column:
    return F.substring(md5(seed), offset, n)


def _uuid(seed: str, rand_long: RandLong, md5: Md5) -> Column:
    h = md5(seed)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def _first(seed: str, rl: RandLong) -> Column:
    return _pick(VOCABS["first_name"], seed + "#fn", rl)


def _last(seed: str, rl: RandLong) -> Column:
    return _pick(VOCABS["last_name"], seed + "#ln", rl)


def _domain(seed: str, rl: RandLong) -> Column:
    return F.concat(
        F.lower(_pick(VOCABS["noun"], seed + "#dw", rl)),
        F.lit("."),
        _pick(VOCABS["domain_suffix"], seed + "#ds", rl),
    )


def _words(seed: str, rl: RandLong, vocab: str, n: int, sep: str = " ") -> Column:
    return F.concat_ws(sep, *[_pick(VOCABS[vocab], f"{seed}#w{i}", rl) for i in range(n)])


def _sentence(seed: str, rl: RandLong, _m: Md5 | None = None) -> Column:
    body = F.concat_ws(
        " ",
        F.initcap(_pick(VOCABS["pronoun_personal"], seed + "#p", rl)),
        _pick(VOCABS["adverb"], seed + "#av", rl),
        _pick(VOCABS["verb"], seed + "#v", rl),
        F.lit("the"),
        _pick(VOCABS["adjective"], seed + "#aj", rl),
        _pick(VOCABS["noun"], seed + "#n", rl),
    )
    return F.concat(body, F.lit("."))


_COMPOSITES: dict[str, Callable[[str, RandLong, Md5], Column]] = {
    "name": lambda s, rl, m: F.concat_ws(" ", _first(s, rl), _last(s, rl)),
    "username": lambda s, rl, m: F.concat(F.lower(_first(s, rl)), _digits(s + "#d", 4, rl)),
    "gamertag": lambda s, rl, m: F.concat(
        _pick(VOCABS["adjective"], s + "#a", rl), _pick(VOCABS["animal"], s + "#n", rl),
        _digits(s + "#d", 2, rl),
    ),
    "email": lambda s, rl, m: F.concat(
        F.lower(_first(s, rl)), F.lit("."), F.lower(_last(s, rl)), F.lit("@"), _domain(s, rl)
    ),
    "domain_name": lambda s, rl, m: _domain(s, rl),
    "url": lambda s, rl, m: F.concat(
        F.lit("https://"), _domain(s, rl), F.lit("/"),
        F.lower(_pick(VOCABS["word"], s + "#p1", rl)), F.lit("/"),
        F.lower(_pick(VOCABS["noun"], s + "#p2", rl)),
    ),
    "phone": lambda s, rl, m: _digits(s, 10, rl),
    "phone_formatted": lambda s, rl, m: F.format_string(
        "%03d-%03d-%04d", rl(s + "#a", 100, 999), rl(s + "#b", 100, 999), rl(s + "#c", 0, 9999)
    ),
    "ssn": lambda s, rl, m: F.format_string(
        "%03d-%02d-%04d", rl(s + "#a", 100, 899), rl(s + "#b", 10, 99), rl(s + "#c", 1, 9999)
    ),
    "zip": lambda s, rl, m: _digits(s, 5, rl),
    "street": lambda s, rl, m: F.concat_ws(
        " ",
        _digits(s + "#no", 3, rl),
        _pick(VOCABS["street_prefix"], s + "#p", rl),
        _pick(VOCABS["street_name"], s + "#n", rl),
        _pick(VOCABS["street_suffix"], s + "#s", rl),
    ),
    "company": lambda s, rl, m: F.concat_ws(
        " ", F.initcap(_pick(VOCABS["noun"], s + "#n", rl)),
        _pick(VOCABS["company_suffix"], s + "#s", rl),
    ),
    "app_name": lambda s, rl, m: F.concat(
        F.initcap(_pick(VOCABS["adjective"], s + "#a", rl)),
        F.initcap(_pick(VOCABS["noun"], s + "#n", rl)),
    ),
    "app_author": lambda s, rl, m: F.concat_ws(" ", _first(s, rl), _last(s, rl)),
    "app_version": lambda s, rl, m: F.format_string(
        "%d.%d.%d", rl(s + "#ma", 0, 9), rl(s + "#mi", 0, 20), rl(s + "#pa", 0, 99)
    ),
    "uuid": _uuid,
    "bool": lambda s, rl, m: F.when(rl(s, 0, 1) == 1, "true").otherwise("false"),
    "digit": lambda s, rl, m: _digits(s, 1, rl),
    "letter": lambda s, rl, m: _pick(tuple("abcdefghijklmnopqrstuvwxyz"), s, rl),
    "hex_color": lambda s, rl, m: F.concat(F.lit("#"), _hex_chars(s, 6, m)),
    "mac_address": lambda s, rl, m: F.concat_ws(
        ":", *[_hex_chars(s, 2, m, 1 + 2 * i) for i in range(6)]
    ),
    "i_pv_4_address": lambda s, rl, m: F.format_string(
        "%d.%d.%d.%d", *[rl(f"{s}#o{i}", 0, 255) for i in range(4)]
    ),
    "i_pv_6_address": lambda s, rl, m: F.concat_ws(
        ":", *[_hex_chars(s, 4, m, 1 + 4 * i) for i in range(8)]
    ),
    "ipv4": lambda s, rl, m: F.format_string(
        "%d.%d.%d.%d", *[rl(f"{s}#o{i}", 0, 255) for i in range(4)]
    ),
    "ipv6": lambda s, rl, m: F.concat_ws(":", *[_hex_chars(s, 4, m, 1 + 4 * i) for i in range(8)]),
    "http_status_code": lambda s, rl, m: F.element_at(
        F.array(*[F.lit(str(c)) for c in _STATUS_CODES]), rl(s, 1, len(_STATUS_CODES)).cast("int")
    ),
    "http_status_code_simple": lambda s, rl, m: F.element_at(
        F.array(*[F.lit(str(c)) for c in _STATUS_SIMPLE]), rl(s, 1, len(_STATUS_SIMPLE)).cast("int")
    ),
    "user_agent": lambda s, rl, m: F.concat(
        F.lit("Mozilla/5.0 (X11; Linux x86_64) Gecko/"), _digits(s, 8, rl)
    ),
    "chrome_user_agent": lambda s, rl, m: F.format_string(
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/%d.0.%d.%d Safari/537.36",
        rl(s + "#a", 70, 120), rl(s + "#b", 1000, 5000), rl(s + "#c", 10, 200),
    ),
    "firefox_user_agent": lambda s, rl, m: F.format_string(
        "Mozilla/5.0 (X11; Linux x86_64; rv:%d.0) Gecko/20100101 Firefox/%d.0",
        rl(s + "#v", 60, 125), rl(s + "#v", 60, 125),
    ),
    "safari_user_agent": lambda s, rl, m: F.format_string(
        "Mozilla/5.0 (Macintosh) AppleWebKit/605.1.15 Version/%d.%d Safari/605.1.15",
        rl(s + "#a", 12, 17), rl(s + "#b", 0, 6),
    ),
    "opera_user_agent": lambda s, rl, m: F.format_string(
        "Opera/9.80 (X11; Linux x86_64) Presto/2.12.388 Version/%d.%d",
        rl(s + "#a", 10, 12), rl(s + "#b", 0, 18),
    ),
    "credit_card_exp": lambda s, rl, m: F.format_string(
        "%02d/%02d", rl(s + "#m", 1, 12), rl(s + "#y", 26, 33)
    ),
    "credit_card_cvv": lambda s, rl, m: _digits(s, 3, rl),
    "bitcoin_address": lambda s, rl, m: F.concat(F.lit("1"), _hex_chars(s, 26, m)),
    "bitcoin_private_key": lambda s, rl, m: F.concat(
        F.lit("5"), _hex_chars(s + "#a", 25, m), _hex_chars(s + "#b", 25, m)
    ),
    "cusip": lambda s, rl, m: F.concat(F.upper(_hex_chars(s, 8, m)), _digits(s + "#c", 1, rl)),
    "isin": lambda s, rl, m: F.concat(
        _pick(VOCABS["country_abr"], s + "#c", rl), F.upper(_hex_chars(s, 9, m)),
        _digits(s + "#d", 1, rl),
    ),
    "latitude": lambda s, rl, m: (rl(s, -90_000_000, 90_000_000).cast("double") / 1e6).cast("string"),
    "longitude": lambda s, rl, m: (rl(s, -180_000_000, 180_000_000).cast("double") / 1e6).cast("string"),
    "time_zone_offset": lambda s, rl, m: (rl(s, -12, 14).cast("double")).cast("string"),
    "date": lambda s, rl, m: F.date_format(
        F.timestamp_seconds(rl(s, 0, 1_767_225_600)), "yyyy-MM-dd HH:mm:ss"
    ),
    "past_date": lambda s, rl, m: F.date_format(
        F.timestamp_seconds(rl(s, 1_262_304_000, 1_700_000_000)), "yyyy-MM-dd HH:mm:ss"
    ),
    "future_date": lambda s, rl, m: F.date_format(
        F.timestamp_seconds(rl(s, 1_800_000_000, 2_200_000_000)), "yyyy-MM-dd HH:mm:ss"
    ),
    "sentence": _sentence,
    "sentence_simple": _sentence,
    "phrase": lambda s, rl, m: _words(s, rl, "word", 3),
    "phrase_noun": lambda s, rl, m: F.concat_ws(
        " ", F.lit("the"), _pick(VOCABS["adjective"], s + "#a", rl), _pick(VOCABS["noun"], s + "#n", rl)
    ),
    "phrase_verb": lambda s, rl, m: F.concat_ws(
        " ", _pick(VOCABS["verb"], s + "#v", rl), F.lit("the"), _pick(VOCABS["noun"], s + "#n", rl)
    ),
    "phrase_adverb": lambda s, rl, m: F.concat_ws(
        " ", _pick(VOCABS["adverb"], s + "#a", rl), _pick(VOCABS["verb"], s + "#v", rl)
    ),
    "phrase_preposition": lambda s, rl, m: F.concat_ws(
        " ", _pick(VOCABS["preposition"], s + "#p", rl), F.lit("the"),
        _pick(VOCABS["noun"], s + "#n", rl),
    ),
    "question": lambda s, rl, m: F.concat(
        F.initcap(_pick(VOCABS["pronoun_interrogative"], s + "#q", rl)),
        F.lit(" "), _pick(VOCABS["verb_linking"], s + "#v", rl),
        F.lit(" the "), _pick(VOCABS["noun"], s + "#n", rl), F.lit("?"),
    ),
    "quote": lambda s, rl, m: F.concat(F.lit('"'), _sentence(s, rl), F.lit('"')),
    "comment": _sentence,
    "blurb": lambda s, rl, m: _words(s, rl, "buzz_word", 2),
    "slogan": lambda s, rl, m: F.concat_ws(
        " ", _pick(VOCABS["bs"], s + "#b", rl), F.lit("your"), _pick(VOCABS["noun"], s + "#n", rl)
    ),
    "product_upc": lambda s, rl, m: _digits(s, 12, rl),
    "product_description": lambda s, rl, m: _sentence(s, rl),
}
