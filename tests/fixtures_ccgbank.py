"""CCGbank AUTO derivation golden fixtures.

Ported verbatim from the reference's test/exec_test.py (the eight
derivations with their golden execution-queue op lists, word lists and
head assertions).  These are TEST DATA, not code: the byte-exact op
reprs are the contract ie_spark.extraction.ccgbank must reproduce.
Regenerate by re-extracting from the reference test file.
"""

CCGBANK_GOLDENS = [{'id': 'test1_Wsj0001_2',
  'auto': '\n'
          '(<T S[dcl] 0 2>\n'
          '  (<T S[dcl] 1 2>\n'
          '    (<T NP 0 1>\n'
          '      (<T N 1 2>\n'
          '        (<L N/N NNP NNP Mr. N_107/N_107>)\n'
          '        (<L N NNP NNP Vinken N>)\n'
          '      )\n'
          '    )\n'
          '    (<T S[dcl]\\NP 0 2>\n'
          '      (<L (S[dcl]\\NP)/NP VBZ VBZ is (S[dcl]\\NP_112)/NP_113>)\n'
          '      (<T NP 0 2>\n'
          '        (<T NP 0 1>\n'
          '          (<L N NN NN chairman N>)\n'
          '        )\n'
          '        (<T NP\\NP 0 2>\n'
          '          (<L (NP\\NP)/NP IN IN of (NP_109\\NP_109)/NP_110>)\n'
          '          (<T NP 0 2>\n'
          '            (<T NP 0 1>\n'
          '              (<T N 1 2>\n'
          '                (<L N/N NNP NNP Elsevier N_107/N_107>)\n'
          '                (<L N NNP NNP N.V. N>)\n'
          '              )\n'
          '            )\n'
          '            (<T NP[conj] 1 2>\n'
          '              (<L , , , , ,>)\n'
          '              (<T NP 1 2>\n'
          '                (<L NP[nb]/N DT DT the NP[nb]_48/N_48>)\n'
          '                (<T N 1 2>\n'
          '                  (<L N/N NNP NNP Dutch N_107/N_107>)\n'
          '                  (<T N 1 2>\n'
          '                    (<L N/N VBG VBG publishing N_107/N_107>)\n'
          '                    (<L N NN NN group N>)\n'
          '                  )\n'
          '                )\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '  )\n'
          '  (<L . . . . .>)\n'
          ')',
  'ops': ['<PushOp>:(Mr, N/N, NNP)',
          '<PushOp>:(Vinken, N, NNP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(be, (S[dcl]\\NP)/NP, VBZ)',
          '<PushOp>:(chairman, N, NN)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(Elsevier, N/N, NNP)',
          '<PushOp>:(N.V, N, NNP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(,, ,, ,)',
          '<PushOp>:(the, NP[nb]/N, DT)',
          '<PushOp>:(Dutch, N/N, NNP)',
          '<PushOp>:(publish, N/N, VBG)',
          '<PushOp>:(group, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, RP NP[conj])',
          '<ExecOp>:(2, RCONJ NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [(0, 1),
            (1, 2),
            (2, 2),
            (3, 2),
            (4, 3),
            (5, 6),
            (6, 4),
            (8, 11),
            (9, 11),
            (10, 11),
            (11, 6)],
  'words': ['Mr.',
            'Vinken',
            'is',
            'chairman',
            'of',
            'Elsevier',
            'N.V.',
            ',',
            'the',
            'Dutch',
            'publishing',
            'group',
            '.']},
 {'id': 'test2_Wsj0037_37',
  'auto': '\n'
          '(<T S[dcl] 0 2>\n'
          '  (<T S[dcl] 1 2>\n'
          '    (<T NP 0 2>\n'
          '      (<T NP 0 1>\n'
          '        (<T N 1 2>\n'
          '          (<T N/N 0 2>\n'
          '            (<L N/N JJR JJR More N_134/N_134>)\n'
          '            (<T N/N[conj] 1 2>\n'
          '              (<L conj CC CC and conj>)\n'
          '              (<L N/N JJR JJR more N_141/N_141>)\n'
          '            )\n'
          '          )\n'
          '          (<L N NNS NNS corners N>)\n'
          '        )\n'
          '      )\n'
          '      (<T NP\\NP 0 2>\n'
          '        (<L (NP\\NP)/NP IN IN of (NP_152\\NP_152)/NP_153>)\n'
          '        (<T NP 1 2>\n'
          '          (<L NP[nb]/N DT DT the NP[nb]_160/N_160>)\n'
          '          (<L N NN NN globe N>)\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '    (<T S[dcl]\\NP 0 2>\n'
          '      (<L (S[dcl]\\NP)/(S[ng]\\NP) VBP VBP are '
          '(S[dcl]\\NP_91)/(S[ng]_92\\NP_91:B)_92>)\n'
          '      (<T S[ng]\\NP 0 2>\n'
          '        (<L (S[ng]\\NP)/(S[adj]\\NP) VBG VBG becoming '
          '(S[ng]\\NP_101)/(S[adj]_102\\NP_101:B)_102>)\n'
          '        (<T S[adj]\\NP 0 2>\n'
          '          (<L (S[adj]\\NP)/PP JJ JJ free '
          '(S[adj]\\NP_109)/PP_110>)\n'
          '          (<T PP 0 2>\n'
          '            (<L PP/NP IN IN of PP/NP_115>)\n'
          '            (<T NP 0 1>\n'
          '              (<T N 1 2>\n'
          '                (<L N/N NN NN tobacco N_124/N_124>)\n'
          '                (<L N NN NN smoke N>)\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '  )\n'
          '  (<L . . . . .>)\n'
          ')',
  'ops': ['<PushOp>:(more, N/N, JJR)',
          '<PushOp>:(and, conj, CC)',
          '<PushOp>:(more, N/N, JJR)',
          '<ExecOp>:(2, RP N/N[conj])',
          '<ExecOp>:(2, RCONJ N/N)',
          '<PushOp>:(corners, N, NNS)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(the, NP[nb]/N, DT)',
          '<PushOp>:(globe, N, NN)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<PushOp>:(be, (S[dcl]\\NP)/(S[ng]\\NP), VBP)',
          '<PushOp>:(become, (S[ng]\\NP)/(S[adj]\\NP), VBG)',
          '<PushOp>:(free, (S[adj]\\NP)/PP, JJ)',
          '<PushOp>:(of, PP/NP, IN)',
          '<PushOp>:(tobacco, N/N, NN)',
          '<PushOp>:(smoke, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA PP)',
          '<ExecOp>:(2, FA S[adj]\\NP)',
          '<ExecOp>:(2, FA S[ng]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [(0, 3),
            (2, 0),
            (3, 7),
            (4, 3),
            (5, 6),
            (6, 4),
            (7, 7),
            (8, 7),
            (9, 8),
            (10, 9),
            (11, 12),
            (12, 10)],
  'words': ['More',
            'and',
            'more',
            'corners',
            'of',
            'the',
            'globe',
            'are',
            'becoming',
            'free',
            'of',
            'tobacco',
            'smoke',
            '.']},
 {'id': 'test3_Wsj0002_1',
  'auto': '\n'
          '(<T S[dcl] 0 2>\n'
          '  (<T S[dcl] 1 2>\n'
          '    (<T NP 0 2>\n'
          '      (<T NP 0 2>\n'
          '        (<T NP 0 2>\n'
          '          (<T NP 0 1>\n'
          '            (<T N 1 2>\n'
          '              (<L N/N NNP NNP Rudolph N_72/N_72>)\n'
          '              (<L N NNP NNP Agnew N>)\n'
          '            )\n'
          '          )\n'
          '          (<L , , , , ,>)\n'
          '        )\n'
          '        (<T NP\\NP 0 1>\n'
          '          (<T S[adj]\\NP 0 2>\n'
          '            (<T S[adj]\\NP 1 2>\n'
          '              (<T NP 0 1>\n'
          '                (<T N 1 2>\n'
          '                  (<L N/N CD CD 55 N_92/N_92>)\n'
          '                  (<L N NNS NNS years N>)\n'
          '                )\n'
          '              )\n'
          '              (<L (S[adj]\\NP)\\NP JJ JJ old '
          '(S[adj]\\NP_82)\\NP_83>)\n'
          '            )\n'
          '            (<T S[adj]\\NP[conj] 1 2>\n'
          '              (<L conj CC CC and conj>)\n'
          '              (<T NP 0 2>\n'
          '                (<T NP 0 1>\n'
          '                  (<T N 1 2>\n'
          '                    (<L N/N JJ JJ former N_102/N_102>)\n'
          '                    (<L N NN NN chairman N>)\n'
          '                  )\n'
          '                )\n'
          '                (<T NP\\NP 0 2>\n'
          '                  (<L (NP\\NP)/NP IN IN of '
          '(NP_111\\NP_111)/NP_112>)\n'
          '                  (<T NP 0 1>\n'
          '                    (<T N 1 2>\n'
          '                      (<L N/N NNP NNP Consolidated N_135/N_135>)\n'
          '                      (<T N 1 2>\n'
          '                        (<L N/N NNP NNP Gold N_128/N_128>)\n'
          '                        (<T N 1 2>\n'
          '                          (<L N/N NNP NNP Fields N_121/N_121>)\n'
          '                          (<L N NNP NNP PLC N>)\n'
          '                        )\n'
          '                      )\n'
          '                    )\n'
          '                  )\n'
          '                )\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '      (<L , , , , ,>)\n'
          '    )\n'
          '    (<T S[dcl]\\NP 0 2>\n'
          '      (<L (S[dcl]\\NP)/(S[pss]\\NP) VBD VBD was '
          '(S[dcl]\\NP_10)/(S[pss]_11\\NP_10:B)_11>)\n'
          '      (<T S[pss]\\NP 0 2>\n'
          '        (<L (S[pss]\\NP)/NP VBN VBN named '
          '(S[pss]\\NP_18)/NP_19>)\n'
          '          (<T NP 0 2> (<T NP 1 2>\n'
          '            (<L NP[nb]/N DT DT a NP[nb]_33/N_33>)\n'
          '            (<T N 1 2>\n'
          '              (<L N/N JJ JJ nonexecutive N_28/N_28>)\n'
          '              (<L N NN NN director N>)\n'
          '            )\n'
          '          )\n'
          '          (<T NP\\NP 0 2>\n'
          '            (<L (NP\\NP)/NP IN IN of (NP_41\\NP_41)/NP_42>)\n'
          '            (<T NP 1 2>\n'
          '              (<L NP[nb]/N DT DT this NP[nb]_63/N_63>)\n'
          '              (<T N 1 2>\n'
          '                (<L N/N JJ JJ British N_58/N_58>)\n'
          '                (<T N 1 2>\n'
          '                  (<L N/N JJ JJ industrial N_51/N_51>)\n'
          '                  (<L N NN NN conglomerate N>)\n'
          '                )\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '  )\n'
          '  (<L . . . . .>)\n'
          ')',
  'ops': ['<PushOp>:(Rudolph, N/N, NNP)',
          '<PushOp>:(Agnew, N, NNP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(,, ,, ,)',
          '<ExecOp>:(2, LP NP)',
          '<PushOp>:(55, N/N, CD)',
          '<PushOp>:(years, N, NNS)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(old, (S[adj]\\NP)\\NP, JJ)',
          '<ExecOp>:(2, BA S[adj]\\NP)',
          '<PushOp>:(and, conj, CC)',
          '<PushOp>:(former, N/N, JJ)',
          '<PushOp>:(chairman, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(Consolidated, N/N, NNP)',
          '<PushOp>:(Gold, N/N, NNP)',
          '<PushOp>:(Fields, N/N, NNP)',
          '<PushOp>:(PLC, N, NNP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, CONJ_TC S[adj]\\NP[conj])',
          '<ExecOp>:(2, RCONJ S[adj]\\NP)',
          '<ExecOp>:(1, L_UNARY_TC NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<PushOp>:(,, ,, ,)',
          '<ExecOp>:(2, LP NP)',
          '<PushOp>:(be, (S[dcl]\\NP)/(S[pss]\\NP), VBD)',
          '<PushOp>:(name, (S[pss]\\NP)/NP, VBN)',
          '<PushOp>:(a, NP[nb]/N, DT)',
          '<PushOp>:(nonexecutive, N/N, JJ)',
          '<PushOp>:(director, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(this, NP[nb]/N, DT)',
          '<PushOp>:(british, N/N, JJ)',
          '<PushOp>:(industrial, N/N, JJ)',
          '<PushOp>:(conglomerate, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, FA S[pss]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None},
 {'id': 'test4_Wsj0999_11',
  'auto': '\n'
          '(<T S[dcl] 0 2>\n'
          '  (<T S[dcl] 0 2>\n'
          '    (<T S[dcl] 1 2>\n'
          '      (<T NP 0 2>\n'
          '        (<T NP 0 1>\n'
          '          (<L N NNS NNS People N>)\n'
          '        )\n'
          '        (<T NP\\NP 0 2>\n'
          '          (<L (NP\\NP)/NP IN IN on (NP_159\\NP_159)/NP_160>)\n'
          '          (<T NP 0 1>\n'
          '            (<T N 1 2>\n'
          '              (<L N/N VBN VBN fixed N_169/N_169>)\n'
          '              (<L N NNS NNS incomes N>)\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '      (<T S[dcl]\\NP 0 2>\n'
          '        (<L (S[dcl]\\NP)/NP VBP VBP get '
          '(S[dcl]\\NP_128)/NP_129>)\n'
          '        (<T NP 0 2>\n'
          '          (<T NP 1 2>\n'
          '            (<L NP[nb]/N DT DT a NP[nb]_136/N_136>)\n'
          '            (<L N NN NN break N>)\n'
          '          )\n'
          '          (<T NP\\NP 0 2>\n'
          '            (<L (NP\\NP)/NP IN IN at (NP_144\\NP_144)/NP_145>)\n'
          '            (<T NP 0 1>\n'
          '              (<L N NNP NNP Espre N>)\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '    (<T S[dcl][conj] 1 2>\n'
          '      (<L ; ; : ; ;>)\n'
          '      (<T S[dcl] 1 2>\n'
          '        (<T NP 0 1>\n'
          '          (<T N 1 2>\n'
          '            (<L N/N IN IN over N_248/N_248>)\n'
          '            (<L N CD CD 55 N>)\n'
          '          )\n'
          '        )\n'
          '        (<T S[dcl]\\NP 0 2>\n'
          '          (<L (S[dcl]\\NP)/NP VBZ NNS wins '
          '(S[dcl]\\NP_177)/NP_178>)\n'
          '          (<T NP 0 2>\n'
          '            (<T NP 1 2>\n'
          '              (<L NP[nb]/N DT DT a NP[nb]_206/N_206>)\n'
          '              (<T N 1 2>\n'
          '                (<T N/N 1 2>\n'
          '                  (<L (N/N)/(N/N) CD CD 45 '
          '(N_201/N_195)_201/(N_201/N_195)_201>)\n'
          '                  (<L N/N NN NN % N_187/N_187>)\n'
          '                )\n'
          '                (<L N NN NN discount N>)\n'
          '              )\n'
          '            )\n'
          '            (<T NP\\NP 0 2>\n'
          '              (<L (NP\\NP)/NP IN IN at (NP_214\\NP_214)/NP_215>)\n'
          '              (<T NP 0 1>\n'
          '                (<T N 1 2>\n'
          '                  (<L N/N NNP NNP Anaheim N_238/N_238>)\n'
          '                  (<T N 1 2>\n'
          '                    (<L N/N NNP NNP Imperial N_231/N_231>)\n'
          '                    (<T N 1 2>\n'
          '                      (<L N/N NNP NNP Health N_224/N_224>)\n'
          '                      (<L N NNP NNP Spa N>)\n'
          '                    )\n'
          '                  )\n'
          '                )\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '  )\n'
          '  (<L . . . . .>)\n'
          ')',
  'ops': ['<PushOp>:(people, N, NNS)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(on, (NP\\NP)/NP, IN)',
          '<PushOp>:(fix, N/N, VBN)',
          '<PushOp>:(incomes, N, NNS)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<PushOp>:(get, (S[dcl]\\NP)/NP, VBP)',
          '<PushOp>:(a, NP[nb]/N, DT)',
          '<PushOp>:(break, N, NN)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(at, (NP\\NP)/NP, IN)',
          '<PushOp>:(Espre, N, NNP)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(;, ;, ;)',
          '<PushOp>:(over, N/N, IN)',
          '<PushOp>:(55, N, CD)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(win, (S[dcl]\\NP)/NP, VBZ)',
          '<PushOp>:(a, NP[nb]/N, DT)',
          '<PushOp>:(45, (N/N)/(N/N), CD)',
          '<PushOp>:(%, N/N, NN)',
          '<ExecOp>:(2, FA N/N)',
          '<PushOp>:(discount, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(at, (NP\\NP)/NP, IN)',
          '<PushOp>:(Anaheim, N/N, NNP)',
          '<PushOp>:(Imperial, N/N, NNP)',
          '<PushOp>:(Health, N/N, NNP)',
          '<PushOp>:(Spa, N, NNP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<ExecOp>:(2, RP S[dcl][conj])',
          '<ExecOp>:(2, RCONJ S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None},
 {'id': 'test5_EasySRL_04_1850',
  'auto': '\n'
          '(<T S[dcl] 0 2>\n'
          '  (<T S[dcl] 1 2>\n'
          '    (<T NP 0 2>\n'
          '      (<L NP/N DT DT The NP/N>)\n'
          '      (<T N 1 2>\n'
          '        (<L N/N NN NN investment N/N>)\n'
          '        (<T N 0 2>\n'
          '          (<L N NN NN community N>)\n'
          '          (<L , , , , ,>)\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '    (<T S[dcl]\\NP 1 2>\n'
          '      (<T (S\\NP)/(S\\NP) 0 2>\n'
          '        (<L (S\\NP)/(S\\NP) RB RB however (S\\NP)/(S\\NP)>)\n'
          '        (<T ((S\\NP)/(S\\NP))\\((S\\NP)/(S\\NP)) 1 2>\n'
          '          (<L , , , , ,>)\n'
          '          (<L (S\\NP)/(S\\NP) RB RB strongly (S\\NP)/(S\\NP)>)\n'
          '        )\n'
          '      )\n'
          '      (<T S[dcl]\\NP 0 2>\n'
          '        (<L (S[dcl]\\NP)/S[em] VBZ VBZ believes '
          '(S[dcl]\\NP)/S[em]>)\n'
          '          (<T S[em] 0 2>\n'
          '            (<L S[em]/S[dcl] IN IN that S[em]/S[dcl]>)\n'
          '            (<T S[dcl] 1 2>\n'
          '              (<T NP 0 2>\n'
          '                 (<L NP/N DT DT the NP/N>)\n'
          '                 (<L N NN NN strike N>)\n'
          '              )\n'
          '              (<T S[dcl]\\NP 0 2>\n'
          '                (<L (S[dcl]\\NP)/(S[b]\\NP) MD MD will '
          '(S[dcl]\\NP)/(S[b]\\NP)>)\n'
          '                (<T S[b]\\NP 0 2>\n'
          '                  (<T S[b]\\NP 0 2>\n'
          '                    (<L (S[b]\\NP)/(S[pss]\\NP) VB VB be '
          '(S[b]\\NP)/(S[pss]\\NP)>)\n'
          '                    (<L S[pss]\\NP VBN VBN settled S[pss]\\NP>)\n'
          '                  )\n'
          '                (<T (S\\NP)\\(S\\NP) 0 2>\n'
          '                  (<L ((S\\NP)\\(S\\NP))/S[dcl] IN IN before '
          '((S\\NP)\\(S\\NP))/S[dcl]>)\n'
          '                  (<T S[dcl] 1 2>\n'
          '                    (<L NP[thr] EX EX there NP[thr]>)\n'
          '                    (<T S[dcl]\\NP[thr] 0 2>\n'
          '                      (<L (S[dcl]\\NP[thr])/NP VBZ VBZ is '
          '(S[dcl]\\NP[thr])/NP>)\n'
          '                      (<T NP 0 2>\n'
          '                        (<T NP 0 2>\n'
          '                          (<L NP/N DT DT any NP/N>)\n'
          '                          (<T N 1 2>\n'
          '                            (<L N/N JJ JJ lasting N/N>)\n'
          '                            (<T N 0 2>\n'
          '                              (<L N/PP NN NN effect N/PP>)\n'
          '                              (<T PP 0 2>\n'
          '                                (<L PP/NP IN IN on PP/NP>)\n'
          '                                (<T NP 1 2>\n'
          '                                  (<L NP/NP CC CC either NP/NP>)\n'
          '                                  (<T NP 0 1>\n'
          '                                    (<L N NNP NNP Boeing N>)\n'
          '                                  )\n'
          '                                )\n'
          '                              )\n'
          '                            )\n'
          '                          )\n'
          '                        )\n'
          '                        (<T NP\\NP 1 2>\n'
          '                          (<L conj CC CC or conj>)\n'
          '                          (<T NP 0 2>\n'
          '                            (<L NP/(N/PP) PRP$ PRP$ its '
          'NP/(N/PP)>)\n'
          '                            (<T N/PP 1 2>\n'
          '                              (<L N/N NN NN work N/N>)\n'
          '                              (<L N/PP NN NN force N/PP>)\n'
          '                            )\n'
          '                          )\n'
          '                        )\n'
          '                      )\n'
          '                    )\n'
          '                  )\n'
          '                )\n'
          '              )\n'
          '            )\n'
          '          )\n'
          '        )\n'
          '      )\n'
          '    )\n'
          '  )\n'
          '  (<L . . . . .>)\n'
          ')',
  'ops': ['<PushOp>:(the, NP/N, DT)',
          '<PushOp>:(investment, N/N, NN)',
          '<PushOp>:(community, N, NN)',
          '<PushOp>:(,, ,, ,)',
          '<ExecOp>:(2, LP N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(however, (S\\NP)/(S\\NP), RB)',
          '<PushOp>:(,, ,, ,)',
          '<PushOp>:(strongly, (S\\NP)/(S\\NP), RB)',
          '<ExecOp>:(2, R_UNARY_TC ((S\\NP)/(S\\NP))\\((S\\NP)/(S\\NP)))',
          '<ExecOp>:(2, BA (S\\NP)/(S\\NP))',
          '<PushOp>:(believe, (S[dcl]\\NP)/S[em], VBZ)',
          '<PushOp>:(that, S[em]/S[dcl], IN)',
          '<PushOp>:(the, NP/N, DT)',
          '<PushOp>:(strike, N, NN)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(will, (S\\NP)/(S\\NP), MD)',
          '<PushOp>:(be, (S[b]\\NP)/(S[pss]\\NP), VB)',
          '<PushOp>:(settle, S[pss]\\NP, VBN)',
          '<ExecOp>:(2, FA S[b]\\NP)',
          '<PushOp>:(before, ((S\\NP)\\(S\\NP))/S[dcl], IN)',
          '<PushOp>:(there, NP[thr], EX)',
          '<PushOp>:(be, (S[dcl]\\NP[thr])/NP, VBZ)',
          '<PushOp>:(any, NP/N, DT)',
          '<PushOp>:(lasting, N/N, JJ)',
          '<PushOp>:(effect, N/PP, NN)',
          '<PushOp>:(on, PP/NP, IN)',
          '<PushOp>:(either, NP/NP, CC)',
          '<PushOp>:(Boeing, N, NNP)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, FA PP)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(or, conj, CC)',
          '<PushOp>:(its, NP/(N/PP), PRP$)',
          '<PushOp>:(work, N/N, NN)',
          '<PushOp>:(force, N/PP, NN)',
          '<ExecOp>:(2, FC N/PP)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, R_UNARY_TC NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP[thr])',
          '<ExecOp>:(2, BA S[dcl])',
          '<ExecOp>:(2, FA (S\\NP)\\(S\\NP))',
          '<ExecOp>:(2, BA S[b]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<ExecOp>:(2, FA S[em])',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None},
 {'id': 'test6_Wsj0051_13',
  'auto': '\n'
          '(<T S[dcl] 0 2> \n'
          '  (<T S[dcl] 1 2> \n'
          '    (<T NP 1 2> \n'
          '      (<L NP[nb]/N DT DT The NP[nb]_273/N_273>) \n'
          '      (<L N NNS NNS bids N>) \n'
          '    ) \n'
          '    (<T S[dcl]\\NP 1 2> \n'
          '      (<T (S\\NP)/(S\\NP) 1 2> \n'
          '        (<L , , , , ,>) \n'
          '        (<T (S\\NP)/(S\\NP) 0 2> \n'
          '          (<T S[dcl]/S[dcl] 1 2> \n'
          '            (<T S/(S\\NP) 0 1> \n'
          '              (<L NP PRP PRP he NP>) \n'
          '            ) \n'
          '            (<L (S[dcl]\\NP)/S[dcl] VBD VBD added '
          '(S[dcl]\\NP_242)/S[dcl]_243>) \n'
          '          ) \n'
          '          (<L , , , , ,>) \n'
          '        ) \n'
          '      ) \n'
          '      (<T S[dcl]\\NP 0 2> \n'
          '        (<L (S[dcl]\\NP)/(S[adj]\\NP) VBD VBD were '
          '(S[dcl]\\NP_211)/(S[adj]_212\\NP_211:B)_212>) \n'
          '        (<T S[adj]\\NP 0 2> \n'
          '          (<L (S[adj]\\NP)/PP JJ JJ contrary '
          '(S[adj]\\NP_219)/PP_220>) \n'
          '          (<T PP 0 2> \n'
          '            (<L PP/NP TO TO to PP/NP_225>) \n'
          '            (<T NP 0 1> \n'
          '              (<T N 1 2> \n'
          '                (<L N/N JJ JJ common N_234/N_234>) \n'
          '                (<L N NN NN sense N>) \n'
          '              ) \n'
          '            ) \n'
          '          ) \n'
          '        ) \n'
          '      ) \n'
          '    ) \n'
          '  ) \n'
          '  (<L . . . . .>) \n'
          ') \n',
  'ops': ['<PushOp>:(the, NP[nb]/N, DT)',
          '<PushOp>:(bids, N, NNS)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(,, ,, ,)',
          '<PushOp>:(he, NP, PRP)',
          '<ExecOp>:(1, TR S/(S\\NP))',
          '<PushOp>:(add, (S[dcl]\\NP)/S[dcl], VBD)',
          '<ExecOp>:(2, FC S[dcl]/S[dcl])',
          '<PushOp>:(,, ,, ,)',
          '<ExecOp>:(2, L_UNARY_TC (S\\NP)/(S\\NP))',
          '<ExecOp>:(2, RP (S\\NP)/(S\\NP))',
          '<PushOp>:(be, (S[dcl]\\NP)/(S[adj]\\NP), VBD)',
          '<PushOp>:(contrary, (S[adj]\\NP)/PP, JJ)',
          '<PushOp>:(to, PP/NP, TO)',
          '<PushOp>:(common, N/N, JJ)',
          '<PushOp>:(sense, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA PP)',
          '<ExecOp>:(2, FA S[adj]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None},
 {'id': 'test7_Wsj0051_30',
  'auto': '\n'
          '(<T S[dcl] 0 2> \n'
          '  (<T S[dcl] 1 2> \n'
          '    (<T NP 0 1> \n'
          '      (<T N 1 2> \n'
          '        (<L N NNP NNP Fujitsu N>) \n'
          '        (<T N[conj] 1 2> \n'
          '          (<L conj CC CC and conj>) \n'
          '          (<L N NNP NNP NEC N>) \n'
          '        ) \n'
          '      ) \n'
          '    ) \n'
          '    (<T S[dcl]\\NP 0 2> \n'
          '      (<L (S[dcl]\\NP)/S[dcl] VBD VBD said '
          '(S[dcl]\\NP_146)/S[dcl]_147>) \n'
          '      (<T S[dcl] 0 2> \n'
          '        (<T S[dcl] 1 2> \n'
          '          (<L NP PRP PRP they NP>) \n'
          '          (<T S[dcl]\\NP 0 2> \n'
          '            (<T (S[dcl]\\NP)/(S[ng]\\NP) 0 2> \n'
          '              (<L (S[dcl]\\NP)/(S[ng]\\NP) VBD VBD were '
          '(S[dcl]\\NP_156)/(S[ng]_157\\NP_156:B)_157>) \n'
          '              (<L (S\\NP)\\(S\\NP) RB RB still '
          '(S_169\\NP_164)_169\\(S_169\\NP_164)_169>) \n'
          '            ) \n'
          '            (<L S[ng]\\NP VBG VBG investigating S[ng]\\NP_174>) \n'
          '          ) \n'
          '        ) \n'
          '        (<T S[dcl][conj] 1 2> \n'
          '          (<L , , , , ,>) \n'
          '          (<T S[dcl][conj] 1 2> \n'
          '            (<L conj CC CC and conj>) \n'
          '            (<T S[em] 0 2> \n'
          '              (<L S[em]/S[dcl] IN IN that S[em]/S[dcl]_181>) \n'
          '              (<T S[dcl] 1 2> \n'
          '                (<T NP 0 2> \n'
          '                  (<T NP 0 1> \n'
          '                    (<L N NN NN knowledge N>) \n'
          '                  ) \n'
          '                  (<T NP\\NP 0 2> \n'
          '                    (<L (NP\\NP)/NP IN IN of '
          '(NP_207\\NP_207)/NP_208>) \n'
          '                    (<T NP 0 1> \n'
          '                      (<T N 1 2> \n'
          '                        (<L N/N JJR JJR more N_224/N_224>) \n'
          '                        (<T N 1 2> \n'
          '                          (<L N/N JJ JJ such N_217/N_217>) \n'
          '                          (<L N NNS NNS bids N>) \n'
          '                        ) \n'
          '                      ) \n'
          '                    ) \n'
          '                  ) \n'
          '                ) \n'
          '                (<T S[dcl]\\NP 0 2> \n'
          '                  (<L (S[dcl]\\NP)/(S[b]\\NP) MD MD could '
          '(S[dcl]\\NP_190)/(S[b]_191\\NP_190:B)_191>) \n'
          '                  (<L S[b]\\NP VB VB emerge S[b]\\NP_196>) \n'
          '                ) \n'
          '              ) \n'
          '            ) \n'
          '          ) \n'
          '        ) \n'
          '      ) \n'
          '    ) \n'
          '  ) \n'
          '  (<L . . . . .>)\n'
          ') \n',
  'ops': ['<PushOp>:(Fujitsu, N, NNP)',
          '<PushOp>:(and, conj, CC)',
          '<PushOp>:(NEC, N, NNP)',
          '<ExecOp>:(2, RP N[conj])',
          '<ExecOp>:(2, RCONJ N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(say, (S[dcl]\\NP)/S[dcl], VBD)',
          '<PushOp>:(they, NP, PRP)',
          '<PushOp>:(be, (S[dcl]\\NP)/(S[ng]\\NP), VBD)',
          '<PushOp>:(still, (S\\NP)\\(S\\NP), RB)',
          '<ExecOp>:(2, BX (S[dcl]\\NP)/(S[ng]\\NP))',
          '<PushOp>:(investigate, S[ng]\\NP, VBG)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(,, ,, ,)',
          '<PushOp>:(and, conj, CC)',
          '<PushOp>:(that, S[em]/S[dcl], IN)',
          '<PushOp>:(knowledge, N, NN)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(more, N/N, JJR)',
          '<PushOp>:(such, N/N, JJ)',
          '<PushOp>:(bids, N, NNS)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<PushOp>:(could, (S\\NP)/(S\\NP), MD)',
          '<PushOp>:(emerge, S[b]\\NP, VB)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<ExecOp>:(2, FA S[em])',
          '<ExecOp>:(2, RP S[dcl][conj])',
          '<ExecOp>:(2, RP S[dcl][conj])',
          '<ExecOp>:(2, RCONJ S[dcl])',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None},
 {'id': 'test8_Wsj0004_3',
  'auto': '\n'
          '        (<T S[dcl] 0 2> (<T S[dcl] 1 2> (<T NP 0 1> (<T N 1 2> '
          '(<L N/N NN NN Compound N_309/N_309>) \n'
          '        (<L N NNS NNS yields N>) ) ) (<T S[dcl]\\NP 0 2> (<L '
          '(S[dcl]\\NP)/NP VBP VBP assume (S[dcl]\\NP_236)/NP_237>) \n'
          '        (<T NP 0 2> (<T NP 0 2> (<T NP 0 1> (<L N NN NN '
          'reinvestment N>) ) (<T NP\\NP 0 2> \n'
          '        (<L (NP\\NP)/NP IN IN of (NP_248\\NP_248)/NP_249>) (<T NP '
          '0 1> (<L N NNS NNS dividends N>) ) ) ) (<T NP[conj] 1 2> \n'
          '        (<L conj CC CC and conj>) (<T S[em] 0 2> (<L S[em]/S[dcl] '
          'IN IN that S[em]/S[dcl]_257>) (<T S[dcl] 1 2> \n'
          '        (<T NP 1 2> (<L NP[nb]/N DT DT the NP[nb]_297/N_297>) (<T '
          'N 1 2> (<L N/N JJ JJ current N_292/N_292>) \n'
          '        (<L N NN NN yield N>) ) ) (<T S[dcl]\\NP 0 2> (<L '
          'S[dcl]\\NP VBZ VBZ continues S[dcl]\\NP_262>) \n'
          '        (<T (S\\NP)\\(S\\NP) 0 2> (<L ((S\\NP)\\(S\\NP))/NP IN IN '
          'for ((S_275\\NP_270)_275\\(S_275\\NP_270)_275)/NP_276>) \n'
          '        (<T NP 1 2> (<L NP[nb]/N DT DT a NP[nb]_283/N_283>) (<L N '
          'NN NN year N>) ) ) ) ) ) ) ) ) ) (<L . . . . .>) ) ',
  'ops': ['<PushOp>:(compound, N/N, NN)',
          '<PushOp>:(yields, N, NNS)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(assume, (S[dcl]\\NP)/NP, VBP)',
          '<PushOp>:(reinvestment, N, NN)',
          '<ExecOp>:(1, LP NP)',
          '<PushOp>:(of, (NP\\NP)/NP, IN)',
          '<PushOp>:(dividends, N, NNS)',
          '<ExecOp>:(1, LP NP)',
          '<ExecOp>:(2, FA NP\\NP)',
          '<ExecOp>:(2, BA NP)',
          '<PushOp>:(and, conj, CC)',
          '<PushOp>:(that, S[em]/S[dcl], IN)',
          '<PushOp>:(the, NP[nb]/N, DT)',
          '<PushOp>:(current, N/N, JJ)',
          '<PushOp>:(yield, N, NN)',
          '<ExecOp>:(2, FA N)',
          '<ExecOp>:(2, FA NP)',
          '<PushOp>:(continue, S[dcl]\\NP, VBZ)',
          '<PushOp>:(for, ((S\\NP)\\(S\\NP))/NP, IN)',
          '<PushOp>:(a, NP[nb]/N, DT)',
          '<PushOp>:(year, N, NN)',
          '<ExecOp>:(2, FA NP)',
          '<ExecOp>:(2, FA (S\\NP)\\(S\\NP))',
          '<ExecOp>:(2, BA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<ExecOp>:(2, FA S[em])',
          '<ExecOp>:(2, ATOM_TC NP[conj])',
          '<ExecOp>:(2, RCONJ NP)',
          '<ExecOp>:(2, FA S[dcl]\\NP)',
          '<ExecOp>:(2, BA S[dcl])',
          '<PushOp>:(., ., .)',
          '<ExecOp>:(2, LP S[dcl])'],
  'heads': [],
  'words': None}]
