package graft.analysis

/** Golden (word, stem) vectors for the Snowball German/French stemmers,
  * derived BY HAND from the published algorithm descriptions — each case
  * traced through the region/suffix rules on paper, independent of the
  * implementation (the PorterStemmer paper-vector method). Shared by
  * SnowballSpec and the ft_stem_de / ft_stem_fr gate entries (the
  * DuckDB oracle freezes these as a VALUES table: no offline stemmer
  * exists there). */
object StemVectors {

  /** Caumanns-stemmer vectors: a frozen subset of the reference's OWN
    * golden corpus (test/contrib/Analyzers/De/data.txt — the full 31
    * pairs + DIN2 file are swept by GermanGoldenSpec; these make the
    * behavior oracle-visible as a VALUES gate). */
  val germanCaumanns: Seq[(String, String)] = Seq(
    "häufig" -> "haufig", "björk" -> "bjork",
    "abschließen" -> "abschliess", "abschließender" -> "abschliess",
    "tische" -> "tisch", "tischen" -> "tisch",
    "haus" -> "hau", "häuser" -> "hau",
    "hauses" -> "hau", "häusern" -> "hau", "hauen" -> "hau",
    "geheimtür" -> "geheimtur", "ausmaß" -> "ausmass",
    "drama" -> "drama", "dramen" -> "dram",
    "xxxxxetende" -> "xxxxx", "xxem" -> "xxem", "xxxnd" -> "xxxnd")

  val german: Seq[(String, String)] = Seq(
    // step 1 declension suffixes in R1
    "tische" -> "tisch", "tischen" -> "tisch",
    "häuser" -> "haus", // er in R1, then umlaut removal
    "aufeinander" -> "aufeinand",
    "arbeiterinnen" -> "arbeiterinn",
    // ß → ss, valid-s-ending gate ('s' after 's' is not strippable)
    "größe" -> "gross", "ausmaß" -> "ausmass",
    "abschließen" -> "abschliess",
    // e-deletion then niss → nis
    "kenntnisse" -> "kenntnis", "bedürfnisse" -> "bedurfnis",
    // 's' after non-s-ending survives
    "verständnis" -> "verstandnis",
    // step 2 st after a valid st-ending with 3+ letters before it
    "glaubst" -> "glaub", "kleinste" -> "klein",
    // step 3 derivational suffixes with R2 gating
    "zufriedenheit" -> "zufried", // heit in R2, then en in R1
    "beziehung" -> "bezieh", // ung exactly at R2
    "häufig" -> "haufig", // ig NOT in R2 → kept
    "schönheit" -> "schonheit", // heit in R1 but not R2 → kept
    // u between vowels is consonant-marked (affects R1)
    "bauern" -> "bau",
    "lesen" -> "les")

  val french: Seq[(String, String)] = Seq(
    // step 1 standard suffixes
    "continuellement" -> "continuel", // ement in RV, then un-double ell
    "franchement" -> "franch",
    "informations" -> "inform", // ations in R2
    "majestueux" -> "majestu", // eux in R2
    "majestueuse" -> "majestu", // euse in R2
    "nationaux" -> "national", // aux → al in R1
    "chevaux" -> "cheval",
    "châteaux" -> "château", // eaux → eau unconditionally
    "possibilité" -> "possibil", // ité in R2 (no abil/ic/iv before)
    "logiquement" -> "logiqu", // ement; iqU NOT in R2 → kept
    // ment found but 2a/2b follow; step-1 deletion stands
    "absolument" -> "absolu",
    // step 2a/2b verb suffixes confined to RV
    "parlaient" -> "parl", // aIent after consonant-marking
    "importante" -> "import", // ante
    "qualité" -> "qualit", // ité blocked by R2 → 2b strips é
    // step 4 residual (no step 1/2 change): s then e
    "chiens" -> "chien",
    "traditionnelle" -> "traditionnel", // residual e, then un-double ell
    "traditionnel" -> "traditionnel")

  val spanish: Seq[(String, String)] = Seq(
    // step 2b verb suffixes in RV
    "cantando" -> "cant", "comiendo" -> "com", "gustaría" -> "gust",
    "canciones" -> "cancion", "guerras" -> "guerr",
    // gu → g after stripping an e-initial verb suffix
    "llegues" -> "lleg",
    // step 2a: y-suffix after u
    "construyendo" -> "constru",
    // step 0: pronoun after accented gerund (ándo un-accented),
    // then the gerund strips in 2b
    "quitándose" -> "quit",
    // step 1 families with R1/R2 gating
    "poderoso" -> "poder",          // oso in R2
    "críticos" -> "critic",         // icos NOT in R2 → residual os only
    "lógica" -> "logic",            // ica NOT in R2 → residual a only
    "importancia" -> "import",      // ancia in R2
    "nacionalidad" -> "nacional",   // idad in R2
    "agradecimiento" -> "agradec",  // imiento in R2
    "mineralogía" -> "mineralog",   // logía → log
    "constitución" -> "constitu",   // ución → u
    "transparencia" -> "transparent", // encia → ente, residual e
    "rápidamente" -> "rapid",       // amente in R1
    "significativas" -> "signific", // ivas in R2, then at in R2
    // residual accents survive only as un-accented vowels
    "está" -> "esta")               // á not in RV → kept, un-accented

  val italian: Seq[(String, String)] = Seq(
    // step 2 verb suffixes in RV
    "cantare" -> "cant", "cantavano" -> "cant", "parliamo" -> "parl",
    // step 0 pronouns: gerund (delete) and infinitive (restore e)
    "vedendolo" -> "ved",   // endo + lo → vedendo → ved
    "mangiarlo" -> "mang",  // ar + lo → mangiare → mangi → mang (3a i)
    // step 1 families with R1/R2/RV gating
    "organizzazione" -> "organizz", // azione in R2
    "nazione" -> "nazion",          // azione NOT in R2 → residual e only
    "mineralogia" -> "mineralog",   // logia → log
    "distribuzione" -> "distribu",  // uzione → u
    "differenza" -> "different",    // enza → ente, residual e
    "cambiamento" -> "camb",        // amento in RV, then residual i
    "rapidamente" -> "rapid",       // amente in R1
    "possibilità" -> "possibil",    // ità in R2; abil NOT in R2 → kept
    "indicativo" -> "indic",        // ivo in R2, then at in R2
    // step 3a residual vowel (+ preceding i), 3b ch → c
    "bellezza" -> "bellezz",
    "cronache" -> "cronac",
    // prelude: u after q marked consonant → RV shifts
    "quando" -> "quand")

  val swedish: Seq[(String, String)] = Seq(
    // step 1 longest-suffix deletion in R1 (min-3 adjustment)
    "jackorna" -> "jack",     // orna
    "hundarna" -> "hund",     // arna
    "hoppades" -> "hopp",     // ades
    "byggandes" -> "bygg",    // andes (present in the published list)
    "byggnadens" -> "byggnad", // ens
    "möjligheterna" -> "möj", // heterna, then step 3 lig
    "klokast" -> "klok",      // ast
    // s-ending gate: valid consonant before s → strip; vowel → keep
    "husets" -> "huset",
    "precis" -> "precis",
    // step 2: double-consonant endings lose one letter, R1-gated
    "friskt" -> "frisk",      // kt
    "byggt" -> "bygg",        // gt
    "katterna" -> "katt",     // erna; tt NOT in R1 after deletion → kept
    // step 3 residuals
    "möjligt" -> "möj",       // gt (step 2), then lig
    "vänliga" -> "vän",       // a, then lig
    "välsignelse" -> "välsign", // e, then els
    "kraftfullt" -> "kraftfull", // fullt → full
    "meningslöst" -> "meningslös", // löst → lös
    // min-3 region adjustment leaves short words whole
    "öst" -> "öst")

  val danish: Seq[(String, String)] = Seq(
    // step 1 longest-suffix deletion in R1
    "accepterede" -> "accept",   // erede
    "løbende" -> "løb",          // ende
    "hundene" -> "hund",         // ene
    "vandet" -> "vand",          // et
    "husets" -> "hus",           // ets (Danish lists it; Swedish keeps huset)
    "mulighedens" -> "mul",      // hedens, then step 3 ig
    "mulighed" -> "mul",         // hed, then step 3 ig
    // s-ending gate (a/å/z/k valid in Danish): consonant/valid → strip
    "katalogs" -> "katalog",
    "cirkus" -> "cirkus",        // u before s → keep
    "hus" -> "hus",              // min-3 region: s not in R1
    // step 2 consonant pairs
    "overvægt" -> "overvæg",     // gt
    // step 3: igst prelude, lig/els deletion, løst → løs
    "venligst" -> "ven",         // igst → venlig, then lig
    "venlige" -> "ven",          // e, then lig
    "hjælpeløst" -> "hjælpeløs", // løst → løs
    "bestemmelse" -> "bestem",   // e, then els, then undouble mm
    // step 4 undouble (the Danish/Norwegian divergence: kat vs katt)
    "kattene" -> "kat",          // ene, then undouble tt
    "komme" -> "kom")            // e, then undouble mm

  val norwegian: Seq[(String, String)] = Seq(
    // step 1 longest-suffix deletion in R1
    "bøkene" -> "bøk",           // ene
    "guttens" -> "gutt",         // ens
    "sikkerhet" -> "sikker",     // het
    "muligheten" -> "mul",       // heten, then step 3 ig
    "mulighetene" -> "mul",      // hetene, then step 3 ig
    // erte/ert → er (aligns past forms with the infinitive's er stem)
    "serverte" -> "server",
    // s-ending gate with the conditional k: valid consonant → strip;
    // k after a vowel → keep; k after a consonant → strip
    "hunds" -> "hund",
    "bruks" -> "bruks",
    "verks" -> "verk",
    // step 2 consonant pairs
    "sendt" -> "send",           // dt
    // step 3 derivational endings (NO undouble step — katt stays katt)
    "hemmelig" -> "hemm",        // elig
    "vennlige" -> "venn",        // e, then lig
    "kattene" -> "katt")         // ene; contrast with the Danish kat

  val dutch: Seq[(String, String)] = Seq(
    // step 1: en/ene after a valid en-ending, then kk/dd/tt undouble
    "bomen" -> "bom",
    "bakken" -> "bak",
    "fietsen" -> "fiets",
    // gem-exception blocks ene; step 2 then strips the bare e
    "gemene" -> "gemen",
    // s after a non-vowel other than j
    "jongens" -> "jongen",
    // heden → heid (step 1), then heid deletion in R2 (step 3a)
    "mogelijkheden" -> "mogelijk",
    "gelijkheid" -> "gelijk",
    // step 2 e-deletion feeding 3b lijk, which repeats step 2
    "lichamelijk" -> "licham",
    "lichamelijke" -> "licham",
    // 3b end/ing with the ig-after chain
    "opleiding" -> "opleid",
    "verdediging" -> "verded",
    "eenvoudig" -> "eenvoud",
    // step 4 vowel undouble (aa/ee/oo/uu before a final consonant)
    "boom" -> "bom",
    "kostbaar" -> "kostbar",
    // region floors: short words survive
    "zee" -> "zee",
    // prelude folds acutes; i between vowels is consonant-marked
    "één" -> "een",
    "koeien" -> "koei")

  val portuguese: Seq[(String, String)] = Seq(
    // step 2 verb suffixes in RV
    "cantando" -> "cant", "falaram" -> "fal", "falámos" -> "fal",
    "comeu" -> "com", "partiu" -> "part", "quisesse" -> "quis",
    // step 1 longest match (ira after t) fails its e-condition → the
    // whole step ends and step 2's ira catches it instead
    "partira" -> "part",
    // step 1 families with R1/R2 gating (nasal marking: ã=a~, õ=o~)
    "organizações" -> "organiz",    // aço~es in R2
    "execução" -> "execu",          // uça~o → u
    "referências" -> "referent",    // ências → ente, residual e
    "rapidamente" -> "rapid",       // amente in R1
    "confortavelmente" -> "confort", // mente, then avel in R2
    "felicidade" -> "felic",        // idade; ic NOT in R2 → kept
    "significativa" -> "signific",  // iva in R2, then at in R2
    "bandeira" -> "bandeir",        // eira → eir in RV
    "departamentos" -> "depart",    // amentos
    "perigoso" -> "perig",          // oso
    "mineralogia" -> "mineralog",   // logia → log
    "confortável" -> "confort",     // ável
    // steps 4/5 residuals: gu-squeeze, ç→c, nasal restore
    "chegue" -> "cheg",
    "almoço" -> "almoc",
    "irmão" -> "irmã",
    "gatos" -> "gat")

  /** Brazilian (the reference BR chain's own accent-folding stemmer,
    * NOT Snowball Portuguese): a frozen subset of the reference's own
    * golden vectors (test/contrib/Analyzers/Br/TestBrazilianStemmer.cs
    * — the full set is swept by BrazilianGoldenSpec; these make the
    * behavior oracle-visible as a VALUES gate). */
  val brazilian: Seq[(String, String)] = Seq(
    // accent folds baked into the stem (unlike Snowball Portuguese)
    "bôas" -> "boas", "bobalhões" -> "bobalho",
    "bocaiúva" -> "bocaiuv", "boçal" -> "bocal",
    "quilométricas" -> "quilometr", "quimioterápicos" -> "quimioterap",
    "quinhão" -> "quinha", "quintão" -> "quinta",
    // standard / verb / residual steps
    "boataria" -> "boat", "bobeira" -> "bobeir",
    "bocadinho" -> "bocadinh", "boiando" -> "boi",
    "quintessência" -> "quintessente", "quintuplicou" -> "quintuplic",
    "quinhentos" -> "quinhent", "quiosque" -> "quiosqu",
    // untouched shapes: no matching suffix, foreign words, RV/R2 null
    "bobagens" -> "bobagens", "bobs" -> "bobs",
    "body" -> "body", "quickly" -> "quickly", "quintal" -> "quintal",
    // abstain (length ≤ 2 after folding) keeps the accents; length 3
    // is stemmable and folds
    "áá" -> "áá", "ááá" -> "aaa")

  val finnish: Seq[(String, String)] = Seq(
    // particle (kin after a vowel), then case ssa, then plural i
    "koirissakin" -> "koir",
    // possessive gate fails (an not after a case ending) → case n
    "koiran" -> "koir",
    "taloissa" -> "talo",
    "talon" -> "talo",
    // case n after a LONG vowel also takes the vowel
    "taloon" -> "talo",
    "kotiin" -> "kot",
    "koti" -> "kot",          // tidy: i after a consonant in R1
    // plural t after a vowel, then tidy a-after-consonant
    "kirjat" -> "kirj",
    "kirjansa" -> "kirj",     // possessive nsa; the a fails its cv gate
    "kirjasi" -> "kirj",      // si not after k
    // ni possessive with the kse → ksi restore, then the ksi case
    "vastaukseni" -> "vastau",
    // sti needs R2: tyypillisesti qualifies, nopeasti does not
    "tyypillisesti" -> "tyypillis",
    "nopeasti" -> "nopeast",
    "puiden" -> "puid",       // den misses R1 → n, then tidy e
    "iloisempi" -> "ilois",   // comparative mpi in R2
    // tidy: a-after-consonant then the final double consonant
    "kukka" -> "kuk",
    // R1 floor: everything out of region survives
    "maan" -> "maan")

  val german2: Seq[(String, String)] = Seq(
    // ae/oe/ue fold to ä/ö/ü BEFORE regions/suffixes (the variant's
    // whole point — the digraph counts as ONE vowel, so R1 moves left
    // and suffixes strip where standard German leaves them)
    "gruenen" -> "grun", "gruen" -> "grun",
    "muede" -> "mud", "baeume" -> "baum", "schoene" -> "schon",
    // qu protection: the u of qu is never folded
    "quelle" -> "quell",
    // marked vowel-u (baUen) is not a ue digraph
    "bauen" -> "bau",
    // shared-step anchors (identical to standard German)
    "tische" -> "tisch", "ausmaß" -> "ausmass", "häufig" -> "haufig")

  val kp: Seq[(String, String)] = Seq(
    // en-removal with vowel lengthening (a/o/u and the gated e)
    "hopen" -> "hoop", "nemen" -> "neem",
    // en-removal + undoubling via Step 6
    "bakken" -> "bak",
    // heden → heid (1), heid deletion (3), then the -ge- INFIX pass
    // fires on mogelijk too (no morphology guard in the algorithm)
    "mogelijkheden" -> "molijk",
    // diminutives: mpje → m; tje blocked by R1 → bare je fallback
    "boompje" -> "boom", "katje" -> "kat",
    // ies → ie
    "tralies" -> "tralie",
    // ge- prefix removal (after step-1 lengthening)
    "gebroken" -> "brook",
    // -ge- infix removal
    "huisgenoot" -> "huisnoot",
    // ieve → ief; final z → s; ing with e-lengthening
    "actieve" -> "actief", "grenzen" -> "grens",
    "wandeling" -> "wandeel")

  val lovins: Seq[(String, String)] = Seq(
    // longest-match ending whose condition FAILS removes nothing
    "nationally" -> "nationally", // ationally matched, stem "n" < B's 3
    "agrees" -> "agrees",         // es matched, E forbids stem-final e
    // ending + respell chains
    "induction" -> "induc",       // ion (Q), then uct→uc
    "metrically" -> "meter",      // ically (A), then metr→meter
    "analyzes" -> "analys",       // es (E), then yz→ys
    "regularly" -> "regl",        // arly (K), then ul→l (not after a/i/o)
    // plain endings and conditions
    "bellies" -> "bel",           // ies (P), then undouble ll
    "sensibilities" -> "sensibil",
    "magnesium" -> "magnes",      // ium
    "hopelessness" -> "hope",     // lessness
    "linearly" -> "lin",          // early under Y (stem ends "in")
    // respell-only paths, incl. the letter gates
    "transmit" -> "transmis",     // mit→mis
    "decipher" -> "decipher")     // her→hes BLOCKED after p

  val turkish: Seq[(String, String)] = Seq(
    // noun suffixes + final devoicing b→p
    "kitabı" -> "kitap", "kitabın" -> "kitap",
    // nominal-verb lAr branch clears the continue flag (postlude skipped)
    "kitaplar" -> "kitap",
    // ndA + lArI in one bracket
    "evlerinde" -> "ev",
    // the recursive ki-chain deletes an interior run
    "odadaki" -> "oda",
    // nominal verb: sUnUz; then yDU past tense
    "güzelsiniz" -> "güzel", "geldi" -> "gel",
    // ndAn + sU + lAr cascade
    "kapılarından" -> "kapı",
    // DUr with try-chain; then yA with buffer y
    "türkiyedir" -> "türki",
    // final ğ devoices to k
    "dağı" -> "dak",
    // reserved word: postlude (and its d-append) skipped
    "adı" -> "ad",
    // append-U after d: the accusative strips, the harmonizing u returns
    "armudu" -> "armudu",
    // single-syllable words are never touched
    "ev" -> "ev")

  val hungarian: Seq[(String, String)] = Seq(
    // case endings in R1 (consonant-start word: R1 after first vowel)
    "házból" -> "ház", "házban" -> "ház", "házakat" -> "ház",
    // case t, then final á→a, then singular-owner a
    "házát" -> "ház",
    // instrumental al after double consonant → delete + undouble
    "fákkal" -> "fák",
    // factive á after double consonant → delete + undouble
    "házzá" -> "ház",
    // owner chains: sing-owner m, then plur-owner ai
    "házaim" -> "ház",
    // case ként, then special án → a, then sing-owner a falls too
    "óránként" -> "ór",
    // the case list's ul consumes stul-words before case_other sees them
    "házastul" -> "házast",
    // é-possessive deletion
    "pénzé" -> "pénz",
    // plural ák → a; the digraph-aware R1 (ly counts as one consonant)
    "almák" -> "alma", "olyan" -> "oly",
    // sing-owner ja with no re-running of earlier steps
    "munkája" -> "munká")

  val romanian: Seq[(String, String)] = Seq(
    // step 0 article/plural removal in R1
    "copilului" -> "copil",     // ului deleted
    "cartea" -> "cart",         // ea → e, then step-4 e
    "lucrurile" -> "lucrur",    // ile → i (not after ab), then step-4 i
    "abile" -> "abil",          // ile AFTER ab → blocked; step-4 e only
    "informaţia" -> "inform",   // aţia → aţi, then verb aţi deleted
    // step 1 combining suffixes (repeat) + step 2 standard suffixes
    "creativitate" -> "creativ", // ivitate → iv in R1
    "abilitate" -> "abil",       // combo out of R1 → step-2 itate in R2
    "construcţiune" -> "construct", // iune after ţ → delete, ţ→t
    "jurnalism" -> "jurnalist",  // ism → ist (normalized, not deleted)
    "importantă" -> "import",    // antă in R2
    "frumoasă" -> "frumoas",     // oasă outside R2 → step-4 ă only
    // step 3 verb suffixes (only when steps 1-2 removed nothing)
    "lucrează" -> "lucr",        // ează after consonant in RV
    "mergem" -> "merg",          // em unconditional
    "citise" -> "citis",         // ise matched but condition char < RV
    // prelude U marking + step 4
    "ploua" -> "plou")

  val english: Seq[(String, String)] = Seq(
    // whole-word exception lists (exception1 / post-1a exception2)
    "skies" -> "sky", "dying" -> "die", "news" -> "news",
    "inning" -> "inning", "proceed" -> "proceed",
    // step 1a plural forms: sses, ied/ies short+long, gated s-deletion
    "caresses" -> "caress", "ties" -> "tie", "cries" -> "cri",
    "gaps" -> "gap", "gas" -> "gas", "kiwis" -> "kiwi",
    // step 1b: eed→ee (then step-5 e), ed/ing deletion with the
    // at/bl/iz +e, undouble, and short-word +e repairs
    "agreed" -> "agre", "feed" -> "feed", "plastered" -> "plaster",
    "motoring" -> "motor", "sing" -> "sing", "hopping" -> "hop",
    "hoping" -> "hope", "sized" -> "size", "disabled" -> "disabl",
    // step 1c y→i after a non-initial consonant
    "cry" -> "cri", "by" -> "by", "say" -> "say",
    // steps 2-4 suffix chains under R1/R2 gating
    "consistency" -> "consist", "sensational" -> "sensat",
    "rationalize" -> "ration", "conditional" -> "condit",
    "adoption" -> "adopt", "quickly" -> "quick", "geology" -> "geolog",
    "fluently" -> "fluentli", // entli matched but outside R1 → frozen
    "generously" -> "generous", // gener R1-exception prefix
    "generate" -> "generat",
    "hopefulness" -> "hope", // fulness→ful (2), ful→∅ (3), e kept (5)
    // step 5 + undouble interplay
    "controlling" -> "control", "roll" -> "roll",
    "happiness" -> "happi")

  val russian: Seq[(String, String)] = Seq(
    // noun endings in RV
    "книги" -> "книг", "книга" -> "книг", "процессы" -> "процесс",
    "территории" -> "территор",
    // perfective gerund (group 1 needs preceding а/я inside RV)
    "читавшись" -> "чита",
    // reflexive then verb group 1 (ет after а)
    "делается" -> "дела",
    // reflexive then verb group 1 (ла after а)
    "осталась" -> "оста",
    // adjectival, then optional participle
    "важная" -> "важн",
    "работающий" -> "работа", // ий, then ющ after а
    "лучший" -> "лучш",
    "людей" -> "люд",
    // а/я condition char must itself be in RV: нн participle NOT
    // stripped (а at rv-1), step 4 undoubles нн instead
    "странный" -> "стран",
    // verb group 2
    "говорить" -> "говор", "сказал" -> "сказа",
    // derivational ость in R2 after noun ь
    "возможность" -> "возможн",
    // superlative ейш(е) in step 4
    "красивейшее" -> "красив", "сильнейший" -> "сильн")
}
